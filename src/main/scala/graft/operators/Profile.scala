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

  /** l-diversity release (Machanavajjhala et al. 2007) — the k-anonymity
    * upgrade: a quasi-identifier group is released only if it BOTH has
    * ≥ k members AND ≥ l distinct sensitive values (a k-anonymous group
    * whose members all share one sensitive value still leaks it —
    * the homogeneity attack k alone cannot stop). Suppressed groups
    * collapse into one '*' row like [[kAnonCounts]]; the released
    * `l_div` is each group's distinct-sensitive count, null on the
    * suppressed aggregate (mixing suppressed groups' diversities would
    * fabricate a meaningless number). Same shape as kAnonCounts plus one
    * distinct aggregate: a two-key count with map-side partials and a
    * split of the small group table. */
  def lDiversityCounts(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1,
      "need quasi columns, k >= 1 and l >= 1")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot be a quasi identifier")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_div"))
      .localCheckpoint(eager = false) // split into safe + suppressed
    val safe = counts.filter(col("n") >= k && col("l_div") >= l)
      .select(quasiCols.map(c => col(c).cast("string").as(c)) ++
        Seq(col("n"), col("l_div"), lit(1L).as("n_groups")): _*)
    val suppressed = counts.filter(col("n") < k || col("l_div") < l)
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_groups"))
      .filter(col("n").isNotNull)
      .select(quasiCols.map(c => lit("*").as(c)) ++
        Seq(col("n"), lit(null).cast("long").as("l_div"),
          col("n_groups")): _*)
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

  /** Pairwise Pearson correlation matrix over numeric columns — computed
    * from EXACT integer moments so the answer is engine-independent:
    * values quantize to `scale`-ths (cents by default), every moment
    * (Σx, Σx², Σxy) accumulates as DECIMAL(38,0) — exact under any
    * aggregation order and partitioning, where a float Σxy would differ
    * between engines AND between runs — and only the final corr formula
    * runs in doubles, on identical exact operands, so the 6-dp-rounded
    * result hash-matches cross-engine. Rows with a null in ANY requested
    * column are dropped first (pairwise-complete would make each pair see
    * a different n).
    *
    * Scale shape: ONE map-side-partial pass producing a single moment
    * row — 2c + c(c−1)/2 + 1 accumulators for c columns — then the pair
    * rows unfold from that one broadcast-sized row. No shuffle beyond the
    * one-row aggregate; 100 TB cost = one scan. */
  /** Exact integer product accumulated as DECIMAL(38,0), with a LONG fast
    * path (optimization r14, guide §"expressions and codegen"): Spark's
    * `Decimal × Decimal` has NO compact representation — every product
    * routes through java.math.BigDecimal.multiply plus a Decimal.set
    * (jstack-confirmed as q_corr's hot frame: `Decimal.$times` →
    * `Decimal.set` inside the codegen'd partial aggregate, ~4.7 s of a
    * 6.6 s query). Two factors below 2³¹ multiply exactly in one long
    * instruction (product < 2⁶² < 2⁶³−1, no overflow possible), and the
    * long→DECIMAL(38,0) cast is a compact Decimal.set — no BigDecimal
    * anywhere on the fast path. Values at or above 2³¹ (±21.5 M units —
    * beyond any quantized metric this repo feeds) take the ORIGINAL
    * decimal-multiply branch, so the result is bit-identical for every
    * input the old expression accepted; the SUM stays DECIMAL(38,0) —
    * order-immune and overflow-checked — at any corpus size. */
  private def prodDec38(a: Column, b: Column): Column = {
    // callers pass LONG columns so the guard and fast path are pure long
    // arithmetic (an abs/compare on a DECIMAL input re-entered the Decimal
    // object path and showed up as a measured 1.5x on the 1-product
    // aggregates — q_anova's paired A/B)
    val lim = lit(1L << 31)
    when(abs(a) < lim && abs(b) < lim, (a * b).cast("decimal(38,0)"))
      .otherwise((a.cast("decimal(18,0)") * b.cast("decimal(18,0)"))
        .cast("decimal(38,0)"))
  }

  def corrMatrix(df: DataFrame, cols: Seq[String],
      scale: Int = 100): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // decimal(18,0) validates the 18-digit domain exactly as before (an
    // over-range value nulls and na.drop removes the row — unchanged
    // semantics); the extra cast to long gives the per-row product its
    // compact fast path (prodDec38)
    val base = df
      .select(cols.map(c =>
        round(col(c) * scale).cast("decimal(18,0)").cast("long")
          .as(s"_$c")): _*)
      .na.drop()
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(col(s"_$c").cast("decimal(38,0)")).as(s"s_$c")) ++
      cols.map(c =>
        sum(prodDec38(col(s"_$c"), col(s"_$c"))).as(s"ss_$c")) ++
      pairs.map { case (a, b) =>
        sum(prodDec38(col(s"_$a"), col(s"_$b")))
          .as(s"sp_${a}_$b") }
    val m = base.agg(aggs.head, aggs.tail: _*)
    def d(name: String) = col(name).cast("double")
    val rows = pairs.map { case (a, b) =>
      val n = d("n")
      val cov = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val vx = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vy = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col("n").as("n"),
        when(vx > 0 && vy > 0, round(cov / (sqrt(vx) * sqrt(vy)), 6))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    m.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-group simple linear regression (OLS y on x) from one pass of
    * EXACT integer moments — the prescriptive step past [[corrMatrix]]'s
    * "are they related": slope/intercept in micro-units plus r² in milli.
    * `xInt`/`yInt` must be exact integer column expressions (cents,
    * counts); moments accumulate in DECIMAL(38,0) (order-immune), the
    * closed forms
    * `slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`,
    * `intercept = (Σy − slope·Σx)/n`,
    * `r² = cov²/(vx·vy)`
    * compute in doubles from identical exact operands, floored to fixed
    * units. Degenerate groups (constant x) → null slope. One map-side-
    * partial aggregate; output is group-cardinality. */
  def olsByGroup(df: DataFrame, groupCol: String,
      xInt: Column, yInt: Column): DataFrame = {
    df.select(col(groupCol),
        xInt.cast("decimal(18,0)").cast("long").as("x"),
        yInt.cast("decimal(18,0)").cast("long").as("y"))
      .na.drop()
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(prodDec38(col("x"), col("x"))).as("sxx"),
        sum(prodDec38(col("y"), col("y"))).as("syy"),
        sum(prodDec38(col("x"), col("y"))).as("sxy"))
      .withColumn("cov", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"))
      .withColumn("vx", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"))
      .withColumn("vy", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"))
      .withColumn("slope", when(col("vx") > 0, col("cov") / col("vx")))
      .select(col(groupCol), col("n"),
        when(col("vx") > 0,
          expr("CAST(floor(1000000 * slope + 0.5) AS BIGINT)"))
          .as("slope_micro"),
        when(col("vx") > 0, expr(
          "CAST(floor(1000000 * (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n + 0.5) AS BIGINT)"))
          .as("intercept_micro"),
        when(col("vx") > 0 && col("vy") > 0, expr(
          "CAST(floor(1000 * cov * cov / (vx * vy) + 0.5) AS BIGINT)"))
          .as("r2_milli"))
  }

  /** Lag-1 autocorrelation of a per-group numeric SERIES (slot-indexed):
    * `r₁ = Σₜ(n·xₜ−T)(n·xₜ₊₁−T) / Σₜ(n·xₜ−T)²` with every deviation a
    * mean-free integer cross-product (the q_cusum discipline — no float
    * mean subtraction anywhere), one final mirrored double division,
    * milli-floored. r₁ ≈ 1 = trending/level-shifted series, ≈ 0 =
    * memoryless, < 0 = alternating — the "does yesterday predict today"
    * number beside CUSUM's level alarms. Consecutiveness is by SLOT
    * VALUE (lead(1) over the slot order must be slot+1), so gaps in a
    * sparse series break pairs instead of fabricating adjacency.
    * Constant series (zero variance) → null. The series table is
    * slot-cardinality: windows partition by group, everything bounded. */
  def lag1Autocorr(series: DataFrame, grpCol: String, slotCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(grpCol).orderBy(slotCol)
    val dec = "CAST(n AS DECIMAL(38,0))"
    series
      .select(col(grpCol).as("grp"), col(slotCol).cast("long").as("slot"),
        col(valCol).cast("long").as("x"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .withColumn("t", sum("x").over(Window.partitionBy("grp")))
      .withColumn("x1", lead("x", 1).over(w))
      .withColumn("s1", lead("slot", 1).over(w))
      .groupBy(col("grp"))
      .agg(max("n").as("n"),
        sum(expr(s"($dec * x - t) * ($dec * x - t)")).as("den"),
        sum(when(col("s1") === col("slot") + 1,
          expr(s"($dec * x - t) * ($dec * x1 - t)"))).as("num"),
        sum(when(col("s1") === col("slot") + 1, 1L).otherwise(0L))
          .as("n_pairs"))
      .select(col("grp"), col("n"), col("n_pairs"),
        when(col("den") > 0 && col("num").isNotNull, expr(
          "CAST(floor(1000 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE) + 0.5) AS BIGINT)"))
          .as("ac1_milli"))
  }

  /** Population Stability Index per group — the industry-standard drift
    * score: each group's value distribution vs the WHOLE population's,
    * over exact power-of-two buckets (the q_length_buckets bit-arithmetic
    * rule — a float ceil(log2) can land on either side of an exact power
    * cross-engine), Laplace-smoothed so empty buckets stay defined:
    * `p_b = (c_gb + 1) / (n_g + K)`, `q_b = (r_b + 1) / (N + K)` with K =
    * distinct observed buckets, `PSI_g = Σ_b (p_b − q_b)·ln(p_b/q_b)`.
    * PSI < 0.1 is conventionally stable, > 0.25 action-worthy.
    *
    * Cross-engine discipline is `Vocab.jsDivergence`'s: every per-bucket
    * term computes in doubles FROM EXACT INTEGER COUNTS and rounds to a
    * pico-unit long BEFORE summing, so the sum is order-immune; output is
    * integer micro units. Shape: one value-bucket count aggregate (map-
    * side partials, the only corpus pass), then everything runs on the
    * groups × K bucket frame — broadcast-sized. */
  def psiByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val bucketed = df
      .select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
      .filter(col("v") > 0)
      .withColumn("bucket_hi", greatest(lit(16L),
        expr("shiftleft(CAST(1 AS BIGINT), length(bin(v - 1)))")))
    val gb = bucketed.groupBy("grp", "bucket_hi")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // feeds ref, totals, and the frame
    val ref = gb.groupBy("bucket_hi").agg(sum("c").as("r"))
    val gn = gb.groupBy("grp").agg(sum("c").as("n_g"))
    val tot = ref.agg(sum("r").as("n_all"),
      count(lit(1)).cast("long").as("k"))
    // full groups × buckets frame so zero-count buckets contribute their
    // smoothed term (that asymmetry IS the drift signal)
    val frame = gn.crossJoin(broadcast(ref))
      .join(gb, Seq("grp", "bucket_hi"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
    val p = (col("c").cast("double") + 1.0) /
      (col("n_g").cast("double") + col("k"))
    val q = (col("r").cast("double") + 1.0) /
      (col("n_all").cast("double") + col("k"))
    frame
      .withColumn("term_pico",
        round((p - q) * log(p / q) * lit(1000000000000.0), 0).cast("long"))
      .groupBy(col("grp"))
      .agg(max("n_g").as("n_values"),
        expr("CAST(round(CAST(sum(term_pico) AS DOUBLE) / 1000000.0) AS BIGINT)")
          .as("psi_micro"))
  }

  /** DuckDB mirror of [[corrMatrix]] — generated from the same (cols,
    * scale) parameters: HUGEINT moments (128-bit, exact like the engine's
    * DECIMAL(38,0)), identical double combining, identical 6-dp round. */
  def corrOracleSql(table: String, cols: Seq[String],
      scale: Int = 100): String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    val quant = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(round($c * $scale) AS HUGEINT) AS x$i" }.mkString(",\n    ")
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val moments =
      (cols.indices.map(i => s"SUM(x$i) AS s$i, SUM(x$i*x$i) AS ss$i") ++
        pairs.map { case (i, j) => s"SUM(x$i*x$j) AS sp${i}_$j" })
        .mkString(",\n    ")
    def d(e: String) = s"CAST($e AS DOUBLE)"
    val branches = pairs.map { case (i, j) =>
      s"""SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y,
         |  CAST(n AS BIGINT) AS n,
         |  round((${d("n")} * ${d(s"sp${i}_$j")} - ${d(s"s$i")} * ${d(s"s$j")})
         |    / (sqrt(${d("n")} * ${d(s"ss$i")} - ${d(s"s$i")} * ${d(s"s$i")})
         |     * sqrt(${d("n")} * ${d(s"ss$j")} - ${d(s"s$j")} * ${d(s"s$j")})), 6)
         |    AS corr
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT
       |    $quant
       |  FROM $table WHERE $notNull),
       |m AS (
       |  SELECT COUNT(*) AS n,
       |    $moments
       |  FROM q)
       |$branches
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group: each group's
    * integer-value distribution vs the REST of the population (the natural
    * "is this source drifting from everyone else" frame — PSI's sibling
    * with no binning and no smoothing; KS reads the worst single point of
    * CDF divergence where PSI reads an average over buckets).
    *
    * D_g = max over pooled values v of |F_g(v) − F_rest(v)|, computed
    * EXACTLY as integers: |cum_g(v)·n_rest − cum_rest(v)·n_g| in
    * DECIMAL(38,0) (the cross-product reaches N² ≈ 10²⁰ at corpus scale —
    * int64 wraps), reported as `ks_micro = (10⁶·D) div (n_g·n_rest)`.
    * No floats anywhere, so the statistic is order-immune and
    * cross-engine exact.
    *
    * Shape: ONE corpus pass (the (grp, value) count aggregate, map-side
    * partials); everything after runs on the groups × distinct-values
    * frame — the same broadcast-sized frame as [[psiByGroup]], with the
    * cumulative sums a per-group window over that bounded frame (for
    * unbounded continuous domains, quantize first — same contract as
    * PSI's buckets). */
  def ksByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val gv = df
      .select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // feeds the value grid, totals, frame
    val tv = gv.groupBy("v").agg(sum("c").as("t"))
    val gn = gv.groupBy("grp").agg(sum("c").as("n_g"))
    val tot = gn.agg(sum("n_g").as("n_all"))
    // full groups × pooled-values grid: each group's ECDF must step at
    // EVERY pooled value (a value the group never saw still moves the
    // rest-CDF, and that gap is exactly what D measures)
    val grid = gn.crossJoin(broadcast(tv))
      .join(gv, Seq("grp", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cg", sum("c").over(w))
      .withColumn("ct", sum("t").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("n_rest", col("n_all") - col("n_g"))
      .withColumn("d", abs(
        expr("CAST(n_rest AS DECIMAL(38,0)) * cg") -
          expr("CAST(n_g AS DECIMAL(38,0)) * (ct - cg)")))
      .groupBy("grp")
      .agg(max("n_g").as("n_values"), max("n_rest").as("n_rest"),
        max("d").as("d_max"))
      .select(col("grp"), col("n_values"),
        when(col("n_rest") > 0,
            expr("(CAST(1000000 AS DECIMAL(38,0)) * d_max) " +
              "div (CAST(n_values AS DECIMAL(38,0)) * n_rest)"))
          .otherwise(lit(null)).cast("long").as("ks_micro"))
  }

  /** Exact one-sided CUSUM drift over a per-group slot series (Page 1954):
    * the TEMPORAL drift detector beside the distributional pair (PSI/KS) —
    * a sustained small excess accumulates where a per-slot threshold never
    * fires. The sequential recursion S_t = max(0, S_{t−1} + y_t) is made
    * window-expressible through the identity
    * `S_t = cum_t − min(0, min_{j≤t} cum_j)` — two running windows, no
    * sequential loop, no per-group arrays. Deviations are mean-free by
    * integer cross-multiplication (`y_t = n_t·D − T`, D slots, T total),
    * so everything is exact under any evaluation order.
    *
    * Input must be a COMPLETE slot grid per group (zero-filled — a silent
    * missing slot IS a negative drift signal and must be a row). Output
    * per (grp, slot): n, `cusum_scaled` (units of count×D) and `drift` =
    * S > 2·T (two mean-slots of cumulative excess). Window partitions are
    * group × slot-count — the time dimension is bounded, so partitions
    * never grow with the corpus. */
  def cusumDrift(counts: DataFrame, grpCol: String, slotCol: String,
      nCol: String): DataFrame = {
    val byGrp = Window.partitionBy("grp")
    val ordered = Window.partitionBy("grp").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .select(col(grpCol).as("grp"), col(slotCol).as("slot"),
        col(nCol).cast("long").as("n"))
      .withColumn("d_slots", count(lit(1)).over(byGrp))
      .withColumn("t_total", sum("n").over(byGrp))
      .withColumn("cum",
        sum(col("n") * col("d_slots") - col("t_total")).over(ordered))
      .withColumn("runmin", least(lit(0L), min("cum").over(ordered)))
      .select(col("grp"), col("slot"), col("n"),
        (col("cum") - col("runmin")).as("cusum_scaled"),
        (col("cum") - col("runmin") > col("t_total") * 2).as("drift"))
  }

  /** Weight-share concentration across groups: the exact Gini coefficient
    * over per-group weight totals plus the largest single-group share —
    * the one-number answer to "is my training mixture dominated by one
    * source?" (0 = perfectly even, →1000 = one group is the corpus).
    * Formula on the SORTED totals: G = (2·Σᵢ i·tᵢ)/(n·T) − (n+1)/n, in
    * DECIMAL(38,0) (Σ i·tᵢ reaches 10²¹ at 10⁴ groups × 10¹³ tokens),
    * reported in milli. One corpus pass for the totals; the rank window
    * runs on the GROUP-cardinality table only (bounded, like the PSI
    * frame — never a corpus-wide sort). Equal totals sort by group name;
    * ties contribute identically under any order, so the rank tiebreak
    * cannot change the score. */
  def giniConcentration(df: DataFrame, groupCol: String,
      weightCol: String): DataFrame = {
    val totals = df
      .select(col(groupCol).as("grp"), col(weightCol).cast("long").as("w"))
      .groupBy("grp").agg(sum("w").as("t"))
    val ranked = totals.withColumn("i",
      row_number().over(Window.orderBy(col("t"), col("grp"))))
    ranked.agg(
        count(lit(1)).as("n_sources"),
        sum("t").as("total_tokens"),
        max("t").as("max_t"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * t")).as("sit"))
      .select(col("n_sources"), col("total_tokens").cast("long"),
        expr("(1000 * (2 * sit - (n_sources + 1) * CAST(total_tokens AS " +
          "DECIMAL(38,0)))) div (n_sources * CAST(total_tokens AS " +
          "DECIMAL(38,0)))").cast("long").as("gini_milli"),
        expr("(1000 * CAST(max_t AS DECIMAL(38,0))) div total_tokens")
          .cast("long").as("top_share_permille"))
  }

  /** Per-group embedding dispersion via the CENTROID TRICK: mean pairwise
    * dot = (‖Σv‖² − Σ‖v‖²) / (n(n−1)) from ONE pass of per-dimension
    * sums — exact and O(N·d) where the naive pairwise formulation is an
    * impossible O(N²) join at corpus scale. High `coherence_permille`
    * (mean pair dot over mean squared norm) = the group is a tight
    * cluster; near zero = the label carries no geometric signal (the
    * anisotropy diagnostic of Ethayarajh 2019, per class).
    *
    * Arithmetic discipline: micro-quantized components, DECIMAL(38,0)
    * moments (Σxq reaches 3·10¹⁵ at 10¹⁰ rows; its square overflows
    * int64), and SIGN-EXPLICIT truncating divisions — the pairwise sum
    * is legitimately negative for dispersed groups, where Spark's
    * toward-zero `div` and DuckDB's flooring `//` disagree by one. */
  def embIsotropy(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("xq", floor(col("x").cast("double") * 1e6).cast("long"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("xq").as("sd"),
        sum(expr("CAST(xq AS DECIMAL(38,0)) * xq")).as("sqq"))
      .groupBy("label")
      .agg(max("n").as("n"),
        sum(expr("CAST(sd AS DECIMAL(38,0)) * sd")).as("ss"),
        sum("sqq").as("t"))
      .withColumn("num", expr("ss - t"))
      .withColumn("den", expr("CAST(n AS DECIMAL(38,0)) * (n - 1)"))
      .select(col("label"), col("n"),
        expr("t div n").cast("long").as("mean_sq_norm_pico"),
        when(col("n") > 1,
            when(col("num") >= 0, expr("num div den"))
              .otherwise(-expr("(-num) div den")))
          .cast("long").as("mean_pair_dot_pico"))
      .withColumn("coherence_permille",
        when(col("mean_pair_dot_pico").isNotNull &&
            col("mean_sq_norm_pico") > 0,
          when(col("mean_pair_dot_pico") >= 0,
              expr("(1000 * mean_pair_dot_pico) div mean_sq_norm_pico"))
            .otherwise(
              -expr("(1000 * -mean_pair_dot_pico) div mean_sq_norm_pico")))
          .cast("long"))

  /** Declarative data-quality gate — the Deequ-style constraint suite an
    * ingest pipeline runs before publishing a table: each rule yields one
    * report row (rule, n_rows, violations, pass). Three rule kinds:
    * `predicateRules` (name → violation predicate), evaluated in ONE
    * conditional-aggregate corpus pass regardless of rule count;
    * `uniqueRules` (name → key columns), each one keyed count — violations
    * = rows beyond the first per duplicate key; `refRules` (name, child
    * key, parent table, parent key), each one left-anti join — violations
    * = orphaned children. The report is rule-cardinality rows; n_rows is
    * attached to the keyed rules by a one-row broadcast. Every number is
    * an exact integer count. */
  def dqChecks(df: DataFrame, predicateRules: Seq[(String, Column)],
      uniqueRules: Seq[(String, Seq[String])] = Nil,
      refRules: Seq[(String, String, DataFrame, String)] = Nil): DataFrame = {
    require(predicateRules.nonEmpty || uniqueRules.nonEmpty ||
      refRules.nonEmpty, "dqChecks needs at least one rule")
    val allNames = predicateRules.map(_._1) ++ uniqueRules.map(_._1) ++
      refRules.map(_._1)
    require(allNames.distinct.length == allNames.length,
      s"duplicate rule names: ${allNames.diff(allNames.distinct).mkString(",")}")
    val spark = df.sparkSession
    import spark.implicits._
    // coalesce: SUM over zero rows is NULL — an empty table must report
    // zero violations (pass), not a null that poisons the pass flag
    val predAggs = count(lit(1)).as("n_rows") +:
      predicateRules.map { case (name, pred) =>
        coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"v_$name") }
    val onePass = df.agg(predAggs.head, predAggs.tail: _*)
      .localCheckpoint(eager = false) // shared by the report and the n_rows attach
    val predRows = predicateRules.map { case (name, _) =>
      onePass.select(lit(name).as("rule"), col("n_rows"),
        col(s"v_$name").as("violations"))
    }
    val nRows = onePass.select("n_rows")
    val uniqRows = uniqueRules.map { case (name, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
        .crossJoin(broadcast(nRows))
        .select(lit(name).as("rule"), col("n_rows"), col("violations"))
    }
    val refRows = refRules.map { case (name, childKey, parent, parentKey) =>
      df.select(col(childKey).as("k"))
        .join(parent.select(col(parentKey).as("k")).distinct(),
          Seq("k"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .crossJoin(broadcast(nRows))
        .select(lit(name).as("rule"), col("n_rows"), col("violations"))
    }
    (predRows ++ uniqRows ++ refRows).reduce(_ unionAll _)
      .withColumn("pass", when(col("violations") === 0, 1L).otherwise(0L))
      .orderBy("rule")
  }

  /** Pearson chi-square test of INDEPENDENCE between two categorical
    * columns, reported per cell (the seasonality twin tests one margin
    * against a fixed calendar; this tests two observed margins against
    * each other). Per cell: observed, the exact-rational expectation in
    * milli-units, and the chi² contribution in micro-units via
    * (n·o − r·c)²/(n·r·c) — numerator and denominator built from EXACT
    * int64 products and converted to double only for the final
    * correctly-rounded IEEE divide, so the value is engine-independent.
    * One corpus pass for the cell counts; margins and totals are
    * cell-cardinality aggregates joined back on the bounded cell table. */
  def chi2Independence(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chi2Cells(df, aCol, bCol)
      .select(col("a"), col("b"), col("o").as("observed"),
        expr("(CAST(1000 AS DECIMAL(38,0)) * r * c) div n").as("expected_milli"),
        col("chi2_micro"))
      .orderBy("a", "b")

  /** Shared margin/deviation table for [[chi2Independence]] and
    * [[cramersV]]: per OBSERVED cell — margins, total, the exact decimal
    * deviation, and the pre-rounded chi2/expectation micro terms.
    * Cross-products widen to DECIMAL(38,0) BEFORE the subtraction/divide
    * (the keySkew/ksByGroup discipline): n·o and r·c each reach N² ≈ 10²⁰
    * past ~3e9 rows, where int64 wraps silently while the DuckDB oracle's
    * HUGEINT keeps going — the engines would diverge exactly when the
    * answer matters. e_micro uses round-to-nearest integer division
    * ((2·10⁶·r·c + n) div 2n) so it needs no float anywhere. */
  private def chi2Cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false)
    val rowTot = cells.groupBy("a").agg(sum("o").as("r"))
    val colTot = cells.groupBy("b").agg(sum("o").as("c"))
    val nTot = cells.agg(sum("o").as("n"))
    cells.join(rowTot, "a").join(colTot, "b")
      .crossJoin(broadcast(nTot))
      .withColumn("dev", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)"))
      .withColumn("chi2_micro",
        expr("CAST(floor(1000000 * dev * dev / " +
          "(CAST(n AS DOUBLE) * r * c) + 0.5) AS BIGINT)"))
      .withColumn("e_micro", expr(
        "(CAST(2000000 AS DECIMAL(38,0)) * r * c + n) div (2 * n)"))
  }

  /** Cramér's V — the [0,1]-normalized effect size over
    * [[chi2Independence]]'s cells, the number that makes chi² comparable
    * across tables of different shape. [[chi2Independence]] emits only
    * OBSERVED cells, but a zero cell still contributes its full
    * expectation to χ² ((0−e)²/e = e) — exactly the mass that makes a
    * perfect association reach V = 1. Summing e over the missing cells
    * needs no enumeration: Σ_missing e = n − Σ_observed r·c/n, so the
    * correction is 10⁶·n minus the sum of PRE-ROUNDED per-observed-cell
    * e_micro terms (round-to-nearest integer division — integer and
    * order-immune, the q_benford discipline, like the chi2_micro terms
    * themselves). V = sqrt(χ²/(n·(min(r,c)−1))) is one mirrored double
    * over integer operands, milli-floored. One corpus pass (the cell
    * count); everything after is bounded by category-pair cardinality. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    chi2Cells(df, aCol, bCol)
      .withColumnRenamed("o", "observed")
      .groupBy()
      .agg(sum("observed").as("n"), countDistinct("a").as("r"),
        countDistinct("b").as("c"), sum("chi2_micro").as("chi2_obs_micro"),
        sum("e_micro").as("e_obs_micro"))
      .select(col("n").cast("long").as("n"),
        col("r").cast("long").as("r"), col("c").cast("long").as("c"),
        // The missing-mass correction 10⁶·n + chi2_obs reaches ~9.2e18
        // (int64 max) past n ≈ 9.2e12 rows; carry the sum in DECIMAL(38,0)
        // (the chi2Cells discipline) and cast to BIGINT only at the end so
        // the engine matches the oracle's HUGEINT at any corpus size.
        expr("CAST(CAST(chi2_obs_micro AS DECIMAL(38,0)) + " +
          "CAST(1000000 AS DECIMAL(38,0)) * n - e_obs_micro AS BIGINT)")
          .as("chi2_micro"),
        when(least(col("r"), col("c")) > 1 && col("n") > 0, expr(
          "CAST(floor(1000 * sqrt(" +
            "CAST(CAST(chi2_obs_micro AS DECIMAL(38,0)) + " +
            "CAST(1000000 AS DECIMAL(38,0)) * n - e_obs_micro AS DOUBLE) " +
            "/ 1000000.0 / " +
            "(CAST(n AS DOUBLE) * (least(r, c) - 1))) + 0.5) AS BIGINT)"))
          .as("v_milli"))
  }

  /** Differentially-private count release (ε-DP Laplace mechanism,
    * Dwork et al. 2006) with PRF-DERIVED noise: each group's count is
    * perturbed by Laplace(1/ε) noise whose uniform draw comes from the
    * md5 of (secretSeed, releaseTag, group key) — the derandomized-DP
    * posture (one fixed draw per (key, release), so a re-run of the same
    * release reproduces byte-identically, while a NEW release tag draws
    * fresh noise; privacy accounting charges per release, exactly as it
    * would for any cached mechanism output).
    *
    * PRIVACY CONTRACT: the ε-DP guarantee holds ONLY while `secretSeed`
    * stays secret — derandomized DP is a keyed PRF construction (Mironov
    * 2012 §5). With a known seed anyone can recompute `noise_milli` from
    * the released group keys and subtract it, recovering exact counts;
    * the release then degrades to deterministic perturbation with zero
    * privacy. The release tag is assumed PUBLIC and provides none on its
    * own. Test registrations deliberately use a fixed, visible seed so the
    * cross-engine oracle can reproduce the draw — a correctness harness,
    * not a private release.
    *
    * Null group values are coalesced to a sentinel before hashing so
    * (null,'x') and ('x',null) draw independent noise and the engine
    * matches oracles whose `||` operator would otherwise null the key.
    * Inverse-CDF transform `-b·sgn(u−½)·ln(1−2|u−½|)` with
    * u = (h + 0.5)/2²⁰ from 5 md5 hex digits — the ln-with-milli-rounding
    * idiom keyness proved cross-engine. Completes the governance trio
    * beside [[kAnonCounts]] (small-group suppression) and
    * [[lDiversityCounts]] (homogeneity): DP releases EVERY group, hiding
    * individuals in the noise instead of hiding groups. One
    * map-side-partial count; noise is a per-row projection on the
    * group-cardinality frame. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      releaseTag: String, secretSeed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(secretSeed.nonEmpty,
      "secretSeed must be non-empty: the DP guarantee is void without a " +
        "secret PRF key (see scaladoc privacy contract)")
    val key = concat_ws("|", lit(secretSeed) +: lit(releaseTag) +:
      groupCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("u",
        (conv(substring(md5(key), 1, 5), 16, 10).cast("double") + 0.5) /
          lit((1L << 20).toDouble))
      .withColumn("noise_milli",
        round(lit(-1000.0 / epsilon) * signum(col("u") - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5))).cast("long"))
      .select(groupCols.map(col) :+ col("n") :+ col("noise_milli") :+
        (col("n") * 1000 + col("noise_milli")).as("released_milli"): _*)
  }

  /** Mutual information between two categorical columns in micro-nats —
    * the information-theoretic sibling of [[chi2Independence]] (χ² asks
    * "is there dependence", MI says how many nats of one column the other
    * carries; the feature-selection score). Per observed cell the
    * pointwise MI (ln(n·o/(r·c)), micro) and the cell's PRE-ROUNDED
    * contribution (o/n)·pmi; the total is the integer sum of the rounded
    * terms (q_benford discipline — summation order can't flip a digit),
    * attached via a window over the BOUNDED cell frame. Zero cells
    * contribute exactly 0 (lim x·ln x = 0), so unlike [[cramersV]] no
    * missing-mass correction exists. The `log()`-with-micro-rounding
    * idiom is the oracle-proven Vocab.keyness G² pattern. */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    chi2Cells(df, aCol, bCol)
      .withColumn("pmi_micro",
        round(log(col("o").cast("double") * col("n") /
          (col("r").cast("double") * col("c"))) * 1e6).cast("long"))
      .withColumn("term_micro",
        round(col("o").cast("double") / col("n") *
          log(col("o").cast("double") * col("n") /
            (col("r").cast("double") * col("c"))) * 1e6).cast("long"))
      .select(col("a"), col("b"), col("o").as("observed"),
        col("pmi_micro"), col("term_micro"),
        sum("term_micro").over(Window.partitionBy())
          .cast("long").as("mi_micro"))
      .orderBy("a", "b")
  }

  /** Per-group Spearman rank correlation from EXACT integer doubled
    * average ranks. Ties take the average rank; to stay integer, ranks are
    * carried DOUBLED: a value with `t` ties after `cum` smaller rows has
    * 2·rank = 2·cum + t + 1 — exact for any tie profile. Rank assignment
    * is a distinct-value-sized window per group (never a corpus-wide
    * window), rows join their rank by (group, value), and ρ is Pearson
    * over the doubled ranks via DECIMAL(38,0) moments — the doubling
    * cancels in the ratio. Degenerate groups (constant column) → null.
    * Shape: two bounded rank tables + two hash joins + one
    * map-side-partial moment aggregate. */
  def spearmanByGroup(df: DataFrame, groupCol: String,
      xInt: Column, yInt: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
        xInt.cast("long").as("x"), yInt.cast("long").as("y"))
      .na.drop()
      .localCheckpoint(eager = false) // read thrice: 2 rank tables + rows
    def ranks2(vc: String): DataFrame = {
      val w = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col("g"), col(vc).as("v"))
        .agg(count(lit(1)).as("t"))
        .select(col("g"), col("v"),
          (coalesce(sum("t").over(w), lit(0L)) * 2 + col("t") + 1)
            .as(s"r$vc"))
    }
    base
      .join(ranks2("x").withColumnRenamed("v", "x"), Seq("g", "x"))
      .join(ranks2("y").withColumnRenamed("v", "y"), Seq("g", "y"))
      .select(col("g"), col("rx"), col("ry"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum(prodDec38(col("rx"), col("rx"))).as("sxx"),
        sum(prodDec38(col("ry"), col("ry"))).as("syy"),
        sum(prodDec38(col("rx"), col("ry"))).as("sxy"))
      .withColumn("cov", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"))
      .withColumn("vx", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"))
      .withColumn("vy", expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"))
      .select(col("g"), col("n"),
        when(col("vx") > 0 && col("vy") > 0, expr(
          "CAST(floor(1000000 * cov / sqrt(vx * vy) + 0.5) AS BIGINT)"))
          .as("rho_micro"))
  }

  /** Per-group Kendall τ-b over a QUANTIZED contingency grid: rows
    * aggregate once into (x, y) cells, then concordant/discordant pair
    * mass comes from the bounded CELL-pair join — never a row-pair join,
    * so the cost is grid², fixed by the quantization regardless of corpus
    * size (the 100 TB shape: one aggregation pass + arithmetic over a
    * few-hundred-cell table). Tie corrections n₁/n₂ come from the grid
    * margins; all pair counts are exact DECIMAL(38,0)
    * (n·(n−1)/2 wraps int64 past n ≈ 4.3e9);
    * τ_b = (C−D)/√((n₀−n₁)(n₀−n₂)) is one mirrored double over exact
    * operands, micro-floored. */
  def kendallTauCells(df: DataFrame, groupCol: String,
      xInt: Column, yInt: Column): DataFrame = {
    val cells = df.select(col(groupCol).as("g"),
        xInt.cast("long").as("x"), yInt.cast("long").as("y"))
      .na.drop()
      .groupBy("g", "x", "y").agg(count(lit(1)).cast("decimal(38,0)").as("m"))
      .localCheckpoint(eager = false) // pairs two-sides + margins
    val pairs = cells.as("p").join(cells.as("q"),
        col("p.g") === col("q.g") && (col("p.x") < col("q.x")))
      .groupBy(col("p.g").as("g"))
      .agg(
        sum(when(col("p.y") < col("q.y"), col("p.m") * col("q.m"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("cc"),
        sum(when(col("p.y") > col("q.y"), col("p.m") * col("q.m"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("dd"))
    // pair counts stay DECIMAL throughout — n(n−1)/2 wraps a long past
    // n ≈ 4.3e9; the products are always even so the /2 is exact
    val margins = cells.groupBy("g").agg(sum("m").as("n"))
    val tx = cells.groupBy("g", "x").agg(sum("m").as("t"))
      .groupBy("g")
      .agg(expr("CAST(SUM(t * (t - 1)) / 2 AS DECIMAL(38,0))").as("n1"))
    val ty = cells.groupBy("g", "y").agg(sum("m").as("t"))
      .groupBy("g")
      .agg(expr("CAST(SUM(t * (t - 1)) / 2 AS DECIMAL(38,0))").as("n2"))
    pairs.join(margins, "g").join(tx, "g").join(ty, "g")
      .withColumn("n0", expr("CAST(n * (n - 1) / 2 AS DECIMAL(38,0))"))
      .select(col("g"), col("n").cast("long").as("n"),
        col("cc").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"),
        when(col("n0") > col("n1") && col("n0") > col("n2"), expr(
          "CAST(floor(1000000 * CAST(cc - dd AS DOUBLE) / " +
            "sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)) + 0.5)" +
            " AS BIGINT)")).as("tau_micro"))
  }

  /** One-way ANOVA F over integer values: between/within sums of squares
    * from EXACT per-group DECIMAL(38,0) moments, each group's SSB/SSW
    * contribution PRE-ROUNDED to integer micro units before the sum (the
    * q_benford discipline — the statistic is the sum of rounded terms, so
    * group summation order is irrelevant and the engines cannot drift).
    * SSB_g = (n·Σx_g − n_g·Σx)²/(n²·n_g), SSW_g = (n_g·Σx²_g − (Σx_g)²)/n_g
    * — both exact rationals evaluated in double from exact integer
    * operands. One map-side-partial group pass; the group table is
    * k-cardinality, totals attach by one-row broadcast. */
  def anovaF(df: DataFrame, groupCol: String, xInt: Column): DataFrame = {
    val g = df.select(col(groupCol).as("g"),
        xInt.cast("decimal(18,0)").cast("long").as("x"))
      .na.drop()
      .groupBy("g")
      .agg(count(lit(1)).cast("decimal(38,0)").as("ng"),
        sum(col("x").cast("decimal(38,0)")).as("sxg"),
        sum(prodDec38(col("x"), col("x"))).as("sxxg"))
    val tot = g.agg(count(lit(1)).cast("long").as("k"),
      sum("ng").as("n"), sum("sxg").as("sx"))
    g.crossJoin(broadcast(tot))
      // devb squared as an explicit product, not pow(x, 2): libm pow is
      // not guaranteed bit-identical across engines where x*x is
      .withColumn("devb", expr("CAST(n * sxg - ng * sx AS DOUBLE)"))
      .select(col("k"), col("n"),
        expr("CAST(floor(1000000 * devb * devb / " +
          "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(ng AS DOUBLE))" +
          " + 0.5) AS BIGINT)").as("ssb_g_micro"),
        expr("CAST(floor(1000000 * " +
          "CAST(ng * sxxg - sxg * sxg AS DOUBLE) / CAST(ng AS DOUBLE)" +
          " + 0.5) AS BIGINT)").as("ssw_g_micro"))
      .groupBy("k", "n")
      .agg(sum("ssb_g_micro").as("ssb_micro"),
        sum("ssw_g_micro").as("ssw_micro"))
      .select(col("k"), col("n").cast("long").as("n"),
        col("ssb_micro").cast("long").as("ssb_micro"),
        col("ssw_micro").cast("long").as("ssw_micro"),
        when(col("k") > 1 && col("n") > col("k") && col("ssw_micro") > 0,
          expr("CAST(floor(1000 * (CAST(ssb_micro AS DOUBLE) / (k - 1)) / " +
            "(CAST(ssw_micro AS DOUBLE) / (n - k)) + 0.5) AS BIGINT)"))
          .as("f_milli"),
        when(col("ssb_micro") + col("ssw_micro") > 0,
          expr("CAST(floor(1000 * CAST(ssb_micro AS DOUBLE) / " +
            "(CAST(ssb_micro AS DOUBLE) + ssw_micro) + 0.5) AS BIGINT)"))
          .as("eta2_milli"))
  }
}
