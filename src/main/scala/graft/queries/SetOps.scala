package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** B-7 set operations (SURVEY.md §2).
  *
  * Scale notes (100 TB): UNION ALL is a zero-shuffle concatenation of scans;
  * the distinct variants (union-distinct / intersect / except) each shuffle
  * once on the full row. Intersect/except are planned as left-semi/left-anti
  * joins after distinct — no materialized intermediate.
  */
object SetOps extends QueryFamily {

  /** q_union — UNION ALL of customer/supplier nation memberships + grouped
    * recount (exercises unionByName and post-union aggregation). */
  def qUnion(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_nationkey").cast("int").as("nk"), lit("cust").as("side"))
    val sp = Tables.supplier(s, dir)
      .select(col("s_nationkey").cast("int").as("nk"), lit("supp").as("side"))
    c.unionByName(sp)
      .groupBy("nk")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("side")).as("n_sides"))
      .orderBy("nk")
  }

  /** q_union_distinct — de-duplicating union. */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nk"))
    val sp = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nk"))
    c.union(sp).distinct().orderBy("nk")
  }

  /** q_intersect — nations having customers ∩ nations having suppliers. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nk"))
    val sp = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nk"))
    c.intersect(sp).orderBy("nk")
  }

  /** q_except — nations having customers ∖ nations having suppliers. */
  def qExcept(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nk"))
    val sp = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nk"))
    c.except(sp).orderBy("nk")
  }

  /** q_union_byname — schema-evolved union: two relations with overlapping
    * but different columns, aligned by NAME with nulls for the missing side
    * (Spark `unionByName(allowMissingColumns)` ≡ DuckDB UNION ALL BY NAME).
    * The shape every multi-source ingest pipeline hits when schemas drift. */
  def qUnionByName(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val c = graft.Tables.customer(s, dir).select(
      lit("cust").as("src"), col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_acctbal").as("bal"))
    val sp = graft.Tables.supplier(s, dir).select(
      lit("supp").as("src"), col("s_suppkey").as("id"),
      col("s_name").as("name"), col("s_nationkey").as("nk"))
    c.unionByName(sp, allowMissingColumns = true)
      .orderBy("src", "id")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_byname" -> (qUnionByName _),
    "q_union" -> (qUnion _),
    "q_union_distinct" -> (qUnionDistinct _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _))

  override val oracle: Map[String, String] = Map(
    "q_union_byname" ->
      """SELECT * FROM (
        |  SELECT 'cust' AS src, c_custkey AS id, c_name AS name, c_acctbal AS bal
        |  FROM customer
        |  UNION ALL BY NAME
        |  SELECT 'supp' AS src, s_suppkey AS id, s_name AS name, s_nationkey AS nk
        |  FROM supplier)
        |ORDER BY src, id""".stripMargin,
    "q_union" ->
      """SELECT nk, COUNT(*) AS n_rows, COUNT(DISTINCT side) AS n_sides FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nk, 'cust' AS side FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS INT) AS nk, 'supp' AS side FROM supplier) u
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "q_union_distinct" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_except" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin)
}
