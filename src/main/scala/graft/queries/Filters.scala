package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** B-1 scans + B-2 projection/filter (SURVEY.md §2).
  *
  * Scale notes (100 TB): every query here is a narrow scan→filter→project
  * pipeline — no shuffle at all except the single-row Q6 aggregate (partial
  * agg reduces each partition to one row before the exchange). Predicates and
  * column selections are plain Catalyst expressions so they reach the parquet
  * reader as PushedFilters/ReadSchema; verified via .explain in
  * ScanPlanSpec.
  */
object Filters extends QueryFamily {

  /** q_scan_parquet — columnar scan + projection pruning + pushed predicate.
    * Root: A2 (HTTP JSON scan ⇒ source scan), /root/reference/syscol/metrics_reporter.go:112-131.
    */
  def qScanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") === 1.0)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** q_scan_json — schema-on-read decode of the dynamic JSON payload
    * (`events.props` is the analog of syscol's metrics map).
    * Root: A3, /root/reference/syscol/metrics_reporter.go:125.
    */
  def qScanJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .orderBy("event_id")

  /** q_project_envelope — literal-enrichment projection: constant + derived
    * context columns, exactly the `transformNone` envelope build.
    * Root: A4, /root/reference/syscol/metrics_reporter.go:133-141.
    */
  def qProjectEnvelope(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        lit("prod").as("namespace"),
        concat(lit("host-"), (col("user_id") % 5).cast("string")).as("hostname"),
        col("user_id"),
        col("event_type"))
      .orderBy("event_id")

  /** q_filter_pred — conjunctive range+equality predicates (TPC-H Q6 shape).
    * Root: A13, /root/reference/syscol/scheduler.go:195-205.
    */
  def qFilterPred(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        dsumProd(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** q_filter_regex — regex predicate on part.p_type.
    * Root: A17, /root/reference/syscol/scheduler.go:278-291 (`executor.*` mask).
    */
  def qFilterRegex(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_type").rlike("^(ECO|PRO)"))
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey")

  /** q_scan_roundtrip — ORC and CSV source/sink fidelity: the lineitem
    * fact rides parquet → ORC write/read → headered CSV write/read (schema
    * supplied on read — never inferSchema) and must aggregate IDENTICALLY
    * to the original parquet, which is exactly what the oracle computes.
    * Exercises both built-in columnar sinks plus the text round-trip of
    * doubles (Java shortest-round-trip repr) and timestamps (session-UTC
    * ISO). Money/quantity sums quantize to integer cents BEFORE the
    * distributed sum — same double bits on both engines, so the quantized
    * sums are order-immune and exact. Scale: both writes are narrow
    * per-partition sinks; the aggregate is the usual map-side-partial
    * hash aggregate. The scratch root comes from `SPARK_GRAFT_SCRATCH`
    * when set (on a cluster this MUST be a shared filesystem — a bare
    * /tmp would be per-node local and executors' shards invisible to the
    * re-read), falling back to a driver-local temp dir which is correct
    * under local[*]. The tiny grouped result (≤ #returnflags rows) is
    * materialized via localCheckpoint so the scratch copies are deleted
    * before the query returns — repeated harness runs accumulate nothing. */
  def qScanRoundtrip(s: SparkSession, dir: String): DataFrame = {
    // Tables.parallel (optimization r15, guide §2.5): without it the ORC
    // write is ONE task writing ONE file, and the whole ORC→CSV→agg chain
    // inherits that serial layout (CSV write: one 30+ MB file). The
    // round-trip VALUES are per-row and the final aggregate is exact-
    // integer/min-max — order- and layout-immune.
    val li = Tables.parallel(Tables.lineitem(s, dir)
      .select("l_orderkey", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_shipdate"))
    val base = graft.operators.Scratch.dir("graft_roundtrip")
    try {
      li.write.mode("overwrite").orc(s"$base/orc")
      val orc = s.read.orc(s"$base/orc")
      orc.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      val csv = s.read.schema(li.schema).option("header", "true")
        .csv(s"$base/csv")
      csv.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_c"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("price_c"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
            .as("min_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
            .as("max_ship"))
        .orderBy("l_returnflag")
        .localCheckpoint() // eager: scratch is safe to delete after this
    } finally {
      graft.operators.Scratch.delete(s, base)
    }
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet" -> (qScanParquet _),
    "q_scan_json" -> (qScanJson _),
    "q_project_envelope" -> (qProjectEnvelope _),
    "q_filter_pred" -> (qFilterPred _),
    "q_filter_regex" -> (qFilterRegex _),
    "q_scan_roundtrip" -> (qScanRoundtrip _))

  override val oracle: Map[String, String] = Map(
    // q_scan_roundtrip's oracle reads the ORIGINAL parquet: the engine's
    // parquet → ORC → CSV round-trip must lose nothing.
    "q_scan_roundtrip" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c,
        |  strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
        |  strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_quantity = 1.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_project_envelope" ->
      """SELECT event_id, 'prod' AS namespace,
        |  'host-' || CAST(user_id % 5 AS VARCHAR) AS hostname,
        |  user_id, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q_filter_pred" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_filter_regex" ->
      """SELECT p_partkey, p_name, p_type
        |FROM part WHERE regexp_matches(p_type, '^(ECO|PRO)')
        |ORDER BY p_partkey""".stripMargin)
}
