package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline, Börzsönyi et al. 2001) per group — the
  * multi-objective data-selection primitive: keep the documents no other
  * document beats on BOTH axes (e.g. maximize token diversity while
  * minimizing length cost). A dominates B iff cost_A ≤ cost_B and
  * value_A ≥ value_B with at least one strict; the frontier is everything
  * undominated — the input a mixture planner selects from without
  * committing to one scalarization of quality.
  *
  * Scale shape — the sort-based skyline WITHOUT a global-order window
  * (the Packing two-phase running-sum discipline): a row is dominated iff
  * (a) some row with strictly smaller cost has value ≥ its value, or
  * (b) an equal-cost row has strictly larger value. (a) decomposes into
  * buckets: the max value over all STRICTLY SMALLER cost buckets comes
  * from a bounded per-(group, bucket) summary joined back broadcast-style,
  * and the in-bucket strictly-smaller-cost max is a range-frame window
  * PARTITIONED BY (group, bucket) — no partition ever sees more than one
  * bucket, so no corpus-scale single-task sort exists anywhere. (b) is a
  * same-cost max over (group, cost). Ties on both axes are mutually
  * undominated and all kept (exact skyline semantics). Everything integer
  * ⇒ full-oracle. */
object Skyline {

  /** Frontier rows of `df` per `groupCol`, minimizing `costCol` and
    * maximizing `valueCol` (both integral). Returns the input columns
    * plus nothing — frontier rows only. */
  def paretoFrontier(df: DataFrame, groupCol: String, idCol: String,
      costCol: String, valueCol: String,
      bucketWidth: Long = 64L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
        col(costCol).cast("long").as("c"), col(valueCol).cast("long").as("u"))
      .withColumn("bkt", expr(s"c div $bucketWidth"))
    // bounded per-(group, bucket) summary -> strictly-smaller-bucket max
    val bstats = base.groupBy("g", "bkt").agg(max("u").as("bu"))
    val wPrefix = Window.partitionBy("g").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bstats.withColumn("prev_bu", max("bu").over(wPrefix))
      .select("g", "bkt", "prev_bu")
    // in-bucket strictly-smaller-cost max: a range frame never crosses
    // its (group, bucket) partition
    val wInBkt = Window.partitionBy("g", "bkt").orderBy("c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameC = Window.partitionBy("g", "c")
    base.join(prefix, Seq("g", "bkt"), "left")
      .withColumn("in_bu", max("u").over(wInBkt))
      .withColumn("same_c_max", max("u").over(wSameC))
      .withColumn("dom_lt",
        greatest(coalesce(col("prev_bu"), lit(Long.MinValue)),
          coalesce(col("in_bu"), lit(Long.MinValue))) >= col("u"))
      .withColumn("dom_eq", col("same_c_max") > col("u"))
      .filter(!col("dom_lt") && !col("dom_eq"))
      .select(col("g"), col("id"), col("c"), col("u"))
  }
}
