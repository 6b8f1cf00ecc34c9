package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.QueryFamily

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val families: Seq[QueryFamily] = Seq(
    graft.queries.Filters,
    graft.queries.Joins,
    graft.queries.Aggregations,
    graft.queries.Windows,
    graft.queries.SetOps,
    graft.queries.ScalarFuncs,
    graft.queries.LlmOps,
    graft.queries.CorpusOps,
    graft.queries.PipelineOps,
    graft.queries.TrainOps,
    graft.queries.CurateOps,
    graft.queries.StatOps,
    graft.queries.DriftOps,
    graft.queries.Sinks)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Aggregations.qAggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the driver's weaker
    * rows-only check (non-SQL-expressible / approximate ops). */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracle).toMap
}
