package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection by median/MAD z-score (SURVEY.md §2 B-10).
  * Median and MAD resist the very outliers they hunt, unlike mean/stddev.
  *
  * Scale shape: two exact per-group percentiles (sort shuffles bounded by
  * group-key cardinality) plus broadcast joins of the tiny per-group stat
  * tables; `approx_percentile` is the documented 100 TB swap with the same
  * plan shape and no sort.
  */
object Outliers {

  /** Rows of `df` whose |value − median| / (1.4826·MAD) exceeds `zMax`,
    * grouped by `groupCol`. Emits the input columns plus `med`, `mad`,
    * `adev`, and the 6-dp-rounded `robust_z`. Groups with MAD = 0 (most
    * rows exactly on the median) yield NULL robust_z and are never
    * flagged — matching DuckDB's NULL-on-double-division-by-zero so the
    * oracle comparison cannot diverge on Infinity. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      zMax: Double): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(groupCol)
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), groupCol)
      .withColumn("robust_z",
        round(col("adev") / (lit(1.4826) * when(col("mad") > 0, col("mad"))),
          6))
      .filter(col("robust_z") > zMax)
  }
}
