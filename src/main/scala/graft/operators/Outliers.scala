package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Rolling z-score anomalies: per `keyCol` series (ordered by
    * `orderCols`), each row is scored against the mean/stddev of its
    * trailing `frame`-row window (itself included); |z| > `zMax` rows are
    * flagged. The streaming-shaped anomaly detector — "is this point
    * abnormal vs its own recent history" — complementing the global
    * median/MAD of [[robustOutliers]].
    *
    * Determinism discipline: window sums run over MILLI-UNIT LONGS
    * (`floor(value·1000)`), not doubles — integer addition is
    * order-independent, so the mean/variance are bit-identical in any
    * engine regardless of how its windowed aggregation associates the
    * frame (Spark accumulates sequentially, DuckDB uses segment trees —
    * double sums would differ in the last ulp). Variance comes from the
    * exact sum/sum-of-squares; z is rounded to 4 dp before the threshold.
    * Warm-up rows (fewer than `frame` predecessors) are not scored.
    *
    * Scale shape: one shuffle on the series key; the frame is O(1) state
    * per row. Milli-quantization bounds: |value| < 9·10⁶ keeps the
    * squared sums inside long for any frame ≤ 100. */
  def rollingZ(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, frame: Int, zMax: Double): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val wf = w.rowsBetween(-(frame - 1), 0)
    df.withColumn("_vq", floor(col(valueCol) * 1000).cast("long"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_sum_q", sum(col("_vq")).over(wf))
      .withColumn("_sumsq_q", sum(col("_vq") * col("_vq")).over(wf))
      .filter(col("_rn") >= frame)
      .withColumn("mean", col("_sum_q").cast("double") / (frame * 1000.0))
      .withColumn("_var",
        col("_sumsq_q").cast("double") / (frame * 1e6) -
          col("mean") * col("mean"))
      .withColumn("z", when(col("_var") > 0,
        round((col(valueCol) - col("mean")) / sqrt(col("_var")), 4)))
      .filter(abs(col("z")) > zMax)
      .drop("_vq", "_rn", "_sum_q", "_sumsq_q", "_var")
  }

  /** Winsorized per-group statistics: exact rank-based pLow/pHigh bounds
    * (type-1 quantiles — the value at position ⌈p·n⌉ of the (value, id)
    * total order, so ties cannot flip between engines), values clipped
    * into [low, high], and the exact clipped sum/mean — the
    * outlier-robust aggregate a report uses when one fat-finger order
    * would otherwise move the mean. Everything integer: `valueCents`
    * must be an exact integer column expression.
    *
    * Scale shape (the [[Ranks]] two-phase discipline): the bounds are two
    * order statistics per group, so the corpus never rides a
    * group-partitioned rank window (a group here can be a third of the
    * table — the 100 TB killer). Phase 1 value-bucket counts
    * (map-side-partial aggregate, `bucketWidth`-cent bands); phase 2 ranks
    * ONLY the buckets straddling the ⌈p·n⌉ positions; the picked bounds
    * broadcast back onto the clipped aggregate. percentile bounds by RANK,
    * not `percentile()` — interpolated percentiles are doubles and
    * engine-ordering-sensitive; position selection is exact. */
  def winsorizedStats(df: DataFrame, groupCol: String, idCol: String,
      valueCents: org.apache.spark.sql.Column,
      pLowPct: Int = 5, pHighPct: Int = 95,
      bucketWidth: Long = 100000L): DataFrame = {
    require(pLowPct >= 0 && pHighPct <= 100 && pLowPct < pHighPct,
      s"need 0 <= pLow < pHigh <= 100, got $pLowPct/$pHighPct")
    require(bucketWidth >= 1, s"need bucketWidth >= 1, got $bucketWidth")
    val base = df
      .select(col(groupCol), col(idCol), valueCents.as("cents"))
      .localCheckpoint(eager = false) // feeds offsets, picks + clipped agg
    val bounds = Ranks.percentileBounds(base, Seq(groupCol),
      expr(s"cents div $bucketWidth"), Seq(col("cents"), col(idCol)),
      "cents", pLowPct, pHighPct, "low_cents", "high_cents")
    base.join(broadcast(bounds), groupCol)
      .withColumn("clipped",
        least(greatest(col("cents"), col("low_cents")), col("high_cents")))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        max("low_cents").as("low_cents"),
        max("high_cents").as("high_cents"),
        sum(when(col("clipped") =!= col("cents"), 1L).otherwise(0L))
          .as("n_clipped"),
        sum("clipped").as("winsor_sum_cents"))
      .withColumn("winsor_mean_cents", expr("winsor_sum_cents div n"))
  }
}
