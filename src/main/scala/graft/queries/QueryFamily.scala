package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of engine queries plus their DuckDB oracle SQL (where the
  * semantics are SQL-expressible — see SURVEY.md §5.2). */
trait QueryFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
