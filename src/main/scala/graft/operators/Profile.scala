package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling (SURVEY.md §2 B-10): the per-column statistics a data
  * card / ingest-validation step reports — row count, null count, exact
  * distinct count, and min/max per column.
  *
  * Plan shape: ONE aggregate branch PER COLUMN, unioned. Deliberately not a
  * single multi-`countDistinct` aggregate: Catalyst plans n distinct
  * aggregates in one query as an Expand ×n (every corpus row replicated n
  * times through the shuffle), while n independent branches each read ONE
  * column from parquet (columnar pruning — per-branch IO is one column's
  * pages, and the per-branch shuffle is partial-aggregated counts, not
  * rows). Branches share nothing, so a scheduler runs them concurrently.
  * At 100 TB the exact `countDistinct` is the only heavy term — the
  * documented swap is `approx_count_distinct` (HLL, one pass, no
  * per-value shuffle) when exactness isn't required by contract.
  */
object Profile {

  sealed trait Kind
  case object Num extends Kind      // min/max as double
  case object Str extends Kind      // min/max as string
  case object Ts extends Kind       // min/max formatted yyyy-MM-dd HH:mm:ss

  /** Per-column profile of `df` for the given (column, kind) spec: one row
    * per column with (col_name, n_rows, n_nulls, n_distinct, min_num,
    * max_num, min_str, max_str) — the num/str pair not applicable to the
    * column's kind is null. Min/max never involve arithmetic (pure
    * comparisons), so the values are engine-exact; timestamps are pinned to
    * an explicit format so rendering cannot diverge. */
  def columnProfile(df: DataFrame, spec: Seq[(String, Kind)]): DataFrame = {
    val branches = spec.map { case (name, kind) =>
      val c = col(name)
      def nul(t: String) = lit(null).cast(t)
      val (minN, maxN, minS, maxS): (Column, Column, Column, Column) =
        kind match {
          case Num => (min(c).cast("double"), max(c).cast("double"),
            nul("string"), nul("string"))
          case Str => (nul("double"), nul("double"),
            min(c).cast("string"), max(c).cast("string"))
          case Ts => (nul("double"), nul("double"),
            date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
        }
      df.select(c)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(c).as("n_distinct"),
          minN.as("min_num"), maxN.as("max_num"),
          minS.as("min_str"), maxS.as("max_str"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    branches.reduce(_ unionByName _)
  }

  /** Profile DRIFT between two snapshot versions — the data-card diff a
    * nightly ingest gate reads: per column, old vs new row/null/distinct
    * counts, deltas, a cardinality-drift flag (distinct count moved by
    * more than 10% of the old value) and a null-drift flag (null RATIO
    * rose by more than 5 percentage points — the "crawler started emitting
    * null languages" catch). Both flags are integer/decimal
    * cross-multiplications, never float ratios; cost is two
    * [[columnProfile]] runs plus a columns-count-sized join. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
      spec: Seq[(String, Kind)]): DataFrame = {
    val o = columnProfile(oldDf, spec).select(col("col_name"),
      col("n_rows").as("n_rows_old"), col("n_nulls").as("n_nulls_old"),
      col("n_distinct").as("n_distinct_old"))
    val n = columnProfile(newDf, spec).select(col("col_name"),
      col("n_rows").as("n_rows_new"), col("n_nulls").as("n_nulls_new"),
      col("n_distinct").as("n_distinct_new"))
    def dec(c: String) = col(c).cast("decimal(19,0)")
    o.join(n, "col_name")
      .withColumn("d_rows", col("n_rows_new") - col("n_rows_old"))
      .withColumn("d_nulls", col("n_nulls_new") - col("n_nulls_old"))
      .withColumn("d_distinct",
        col("n_distinct_new") - col("n_distinct_old"))
      .withColumn("distinct_drift",
        abs(col("d_distinct")) * 10 > col("n_distinct_old"))
      // null ratio rose > 5pp: (nn/rn − no/ro) > 1/20, cross-multiplied in
      // decimal(38,0) — long×long would overflow at 10¹³-row snapshots
      .withColumn("null_drift",
        (dec("n_nulls_new") * dec("n_rows_old") -
          dec("n_nulls_old") * dec("n_rows_new")) * lit(20) >
          dec("n_rows_new") * dec("n_rows_old"))
  }

  /** k-anonymous release of a grouped count table (the minimum-cell-size
    * rule of statistical disclosure control — public method): quasi-
    * identifier groups with fewer than `k` members are NOT published
    * individually — they collapse into one synthetic `*`-bucket carrying
    * their total count and the number of suppressed groups, so the
    * released table never isolates a small population. Safe groups pass
    * through with `n_groups = 1`; if nothing falls below `k` the `*` row
    * is absent. Plan shape: one map-side-partial count aggregate over the
    * quasi columns, then a two-way split of the (small) group table — the
    * corpus itself is touched once.
    *
    * Released schema: every quasi column is CAST TO STRING — the `*`
    * suppression bucket is a string sentinel, so a released table that can
    * carry it cannot keep numeric/date quasi columns in their native type
    * (unionByName would reject the branches). String quasi columns are
    * unchanged; numeric/date ones release as their canonical Spark string
    * form. */
  def kAnonCounts(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val safe = counts.filter(col("n") >= k)
      .select(quasiCols.map(c => col(c).cast("string").as(c)) ++
        Seq(col("n"), lit(1L).as("n_groups")): _*)
    val suppressed = counts.filter(col("n") < k)
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_groups"))
      .filter(col("n").isNotNull) // no suppressed groups → no '*' row
      .select(quasiCols.map(c => lit("*").as(c)) ++
        Seq(col("n"), col("n_groups")): _*)
    safe.unionByName(suppressed)
  }

  /** Key-skew diagnostics: the top-`topN` hottest values of `keyCol` with
    * their counts, per-mille share, and a hot flag (key count > 10× the
    * mean key count). This is the measurement that DECIDES the engine's
    * skew machinery: a key flagged hot here is what the salted aggregate
    * and salted join exist for, and at 100 TB you run this (on a sample)
    * before picking salt counts. The hot comparison cross-multiplies in
    * decimal(38,0) — the same discipline as [[profileDrift]]: at 10¹³
    * rows × 10⁸ keys a long×long product wraps negative and would unflag
    * exactly the hottest keys.
    *
    * Plan shape: one map-side-partial count over the key, a one-row
    * totals aggregate derived from that (vocabulary-sized) count table
    * broadcast back, and a TakeOrdered top-N — the corpus is read once,
    * nothing corpus-sized shuffles. The rank window runs on ≤ topN rows
    * AFTER the limit. */
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    def dec(c: String) = col(c).cast("decimal(19,0)")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // feeds the totals + the top-N
    val stats = counts.agg(sum("n").as("n_total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .orderBy(desc("n"), asc("key")).limit(topN)
      .withColumn("rnk",
        row_number().over(Window.orderBy(desc("n"), asc("key"))))
      .withColumn("pm", expr("n * 1000 DIV n_total"))
      .withColumn("hot",
        dec("n") * dec("n_keys") > dec("n_total") * lit(10))
  }
}
