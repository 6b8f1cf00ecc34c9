package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** B-4 aggregations (SURVEY.md §2 Part B).
  *
  * Determinism discipline for the DuckDB oracle: money aggregates are summed
  * in decimal (exact, order-independent in both engines) and cast to double
  * only at the end; every query ends in a total-order `orderBy`.
  *
  * Scale notes (100 TB): all aggregates here are hash aggregates with
  * map-side partial aggregation (Catalyst `AggUtils` plans partial+final
  * automatically); grouping keys are low-cardinality so the shuffle after
  * partial agg is tiny regardless of input size.
  */
object Aggregations {

  /** Decimal-exact sum of a money column, surfaced as double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** q_agg_hash — TPC-H Q1 shape on lineitem (root: A14
    * /root/reference/syscol/scheduler.go:293-302, filter+sum aggregate).
    */
  def qAggHash(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_hash" -> (qAggHash _)
  )

  val oracle: Map[String, String] = Map(
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
