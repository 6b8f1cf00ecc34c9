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
  * partial agg is tiny regardless of input size. `count(distinct)` is planned
  * as the two-phase Expand rewrite; at extreme cardinality swap in
  * `approx_count_distinct` (q_agg_approx is the registered scale path).
  */
object Aggregations extends QueryFamily {

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

  /** q_agg_distinct — exact distinct count per group. */
  def qAggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("event_type")

  /** q_agg_approx — approximate distinct users per event type via a KMV
    * (k-minimum-values, Bar-Yossef et al. 2002) sketch built from the md5
    * hash family, FULLY oracle-checked: the same approximate-distinct use
    * case Spark's HLL (`approx_count_distinct`, which stays property-tested
    * in ApproxSpec as the native alternative) serves, but with
    * engine-independent arithmetic so DuckDB reproduces the estimate
    * bit-for-bit — the q_kmv_distinct trick retiring this query's former
    * rows-only status. k = 64 (stderr ≈ 1/√62 ≈ 13%); a group with fewer
    * than k distinct hashes saw everything, so its estimate IS its count.
    * Shape: one distinct-pairs aggregate, then a rank-filtered window that
    * Spark's InferWindowGroupLimit keeps k-bounded BELOW the exchange — at
    * most k rows per group per map task ever shuffle, the 100 TB shape. */
  def qAggApprox(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val hv = Tables.events(s, dir)
      .select(col("event_type").as("g"), col("user_id")).distinct()
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
          .cast("long"))
      .select("g", "h").distinct() // KMV is over distinct hash VALUES
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("h")
    hv.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("g")
      .agg(count(lit(1)).as("cnt"), max("h").as("h_k"))
      .select(col("g").as("event_type"),
        when(col("cnt") < k, col("cnt"))
          .otherwise(expr(s"(CAST(${k - 1} AS BIGINT) * ${1L << 48}) div h_k"))
          .as("approx_users"))
      .orderBy("event_type")
  }

  /** q_agg_rollup — hierarchical totals region→nation→(all), expressed as
    * explicit grouping sets ((r,n),(r),()) — semantically ROLLUP, same single
    * Expand + hash-aggregate plan. `Dataset.rollup` itself trips Spark 4.1's
    * ambiguous-column (dataset-id) check whenever its child contains a join,
    * even behind a fresh projection; `groupingSets` resolves cleanly. */
  def qAggRollup(s: SparkSession, dir: String): DataFrame = {
    // Tables.parallel measured and rejected (see q_agg_cube): 1.07x worse.
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name"), n("n_name"), c("c_acctbal"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq.empty),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q_agg_cube — all grouping combinations of status × priority. */
  def qAggCube(s: SparkSession, dir: String): DataFrame =
    // Tables.parallel MEASURED AND REJECTED here (optimization r15, guide
    // §2.5): paired A/B median 1.48x WORSE (1.23/1.48/1.62). The Expand ×
    // grouping-sets work on this sub-second scan is cheaper single-task
    // than the round-robin exchange it takes to spread it; same verdict
    // on q_agg_gsets (1.89x) and q_agg_rollup (1.07x).
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** q_agg_gsets — explicit grouping sets through the Dataset API (Spark 4's
    * `Dataset.groupingSets`), same Catalyst Expand operator as rollup/cube.
    * Pure function of its inputs — no temp-view session mutation. */
  def qAggGsets(s: SparkSession, dir: String): DataFrame =
    // Tables.parallel measured and rejected (see q_agg_cube): 1.89x worse.
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** q_agg_minmax_by — arg-max/arg-min: top/bottom event per user by
    * (value, event_id) — the pair makes the ordering total so the argmax is
    * deterministic in both engines. */
  def qAggMinmaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        max_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("top_event"),
        min_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("bottom_event"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"))
      .orderBy("user_id")

  /** q_agg_percentile — exact median/quartiles per group (Spark
    * `percentile` and DuckDB `quantile_cont` both linear-interpolate —
    * verified bit-identical on interpolated values). The 100 TB path swaps
    * in `approx_percentile` (t-digest) the same way q_agg_approx shadows
    * countDistinct. */
  def qAggPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** q_agg_approx_pct — approximate percentiles per group over a
    * DETERMINISTIC md5 hash sample (10%), FULLY oracle-checked: the
    * approximate-percentile use case Spark's t-digest
    * (`approx_percentile`, which stays property-tested in ApproxSpec as
    * the native mergeable alternative) serves, but with
    * engine-independent arithmetic — the sample membership is a pure hash
    * of the row key and the percentile over the sample is the exact
    * interpolated one, so DuckDB reproduces the estimate bit-for-bit (the
    * q_agg_approx KMV discipline applied to percentiles). Sample
    * percentile error is O(1/√(p(1−p)·sample)) — the classic
    * sample-quantile bound; `n` stays the exact full count so the checked
    * output also exposes the sampling rate. Shape: the sample predicate
    * rides the scan (a codegen projection, no pre-pass), then the same
    * bounded per-group sort as q_agg_percentile over 10% of the rows. */
  def qAggApproxPct(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val inSample =
      conv(substring(md5(concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))), 1, 12), 16, 10)
        .cast("long") % 10 === 0
    l.withColumn("in_sample", inSample)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(IF(in_sample, l_quantity, NULL), 0.5)")
          .as("med_qty"),
        expr("percentile(IF(in_sample, l_extendedprice, NULL), 0.25)")
          .as("p25_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** q_agg_collect — array-collecting aggregation: per-nation sorted key
    * list + distinct segment set (sorted for cross-engine determinism —
    * collect order is partition-dependent, the sort makes it canonical).
    * Both lists are comma-joined into canonical strings: the driver's
    * checker sorts rows in pandas, and array cells are unhashable there. */
  def qAggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .agg(
        array_join(sort_array(collect_list(col("c_custkey"))), ",")
          .as("custkeys"),
        array_join(sort_array(collect_set(col("c_mktsegment"))), ",")
          .as("segments"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")

  /** q_agg_stats — variance/stddev computed order-independently: sums and
    * sums-of-squares accumulate in exact decimal, the variance formula
    * ((ss - s²/n)/(n-1)) runs in double only at the end — identical IEEE
    * ops on both engines, unlike the built-in var_samp whose streaming
    * accumulation is float-order-dependent. */
  def qAggStats(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("s"),
        sum(q * q).cast("double").as("ss"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
          .as("var_qty"),
        sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
          .as("std_qty"))
      .orderBy("l_returnflag")
  }

  /** q_agg_weighted — quantity-weighted mean price via the typed
    * `Aggregator` extension point (TypedAggregators.WeightedMean): the
    * engine's UDAF surface exercised by a production query, not only by
    * tests. FULLY oracle-checked since round 10: the UDAF's double sums
    * are order-dependent in general, but over INTEGRAL-VALUED doubles
    * they are exact in any order while below 2⁵³ (the q_agg_salted
    * argument) — so the query feeds cent-quantized prices and integral
    * quantities, every partial sum is an exact integer, and the final
    * ratio is one correctly-rounded IEEE divide both engines perform on
    * identical operands. Output in cents keeps the checked value one
    * divide from the inputs. (At 100 TB the Σ(w·x) integer exceeds 2⁵³ —
    * there the production path widens the accumulator to two Longs /
    * DECIMAL, the chi2Cells discipline; the generic double UDAF keeps its
    * ±ulp property test in TextVectorSpec.) */
  def qAggWeighted(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val wm = udaf(new graft.functions.TypedAggregators.WeightedMean(),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        wm(round(col("l_extendedprice") * 100).cast("double"),
          col("l_quantity").cast("double")).as("wavg_price_cents"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** q_agg_salted — two-phase aggregation with an explicit salt
    * (`Layout.saltedAgg` gets its production consumer): partial sums per
    * (key, salt), final per key. The shape for aggregations where one
    * group's partial state outgrows a reducer (giant distinct sets, huge
    * collects) — the salt bounds per-reducer state. Oracle-checked against
    * the plain one-phase aggregate: salting must never change the answer
    * (l_quantity is integral-valued, so double summation is exact in any
    * order on both engines). */
  def qAggSalted(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.saltedAgg(
        Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("k"),
            col("l_quantity").as("v"),
            col("l_orderkey"), col("l_linenumber")),
        "k", "v", struct(col("l_orderkey"), col("l_linenumber")), salts = 8)
      .orderBy("k")

  /** q_rfm — RFM customer segmentation (recency / frequency / monetary
    * with quintile scores): the classic marketing-analytics rollup, done
    * scale-honest — quintile boundaries come from ONE exact-percentile
    * aggregate broadcast back (the q_curriculum discipline), never a
    * global ntile sort (which funnels every customer through one
    * partition). Monetary sums in exact cents; the anchor date is the
    * corpus max (no wall-clock). R scores invert (recent = 5);
    * `rfm = 100r + 10f + m`. */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val per = o.groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("monetary_cents"))
    val anchor = per.agg(max("last_order").as("anchor"))
    val scored = per.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("anchor"), col("last_order")).cast("long"))
    val qs = (1 until 5).map(i => lit(i / 5.0))
    val bounds = scored.agg(
      array(qs.map(q => percentile(col("recency_days"), q)): _*).as("rb"),
      array(qs.map(q => percentile(col("frequency"), q)): _*).as("fb"),
      array(qs.map(q => percentile(col("monetary_cents"), q)): _*).as("mb"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("r_score", lit(5L) -
        size(filter(col("rb"), b => b < col("recency_days").cast("double")))
          .cast("long"))
      .withColumn("f_score",
        size(filter(col("fb"), b => b < col("frequency").cast("double")))
          .cast("long") + 1L)
      .withColumn("m_score",
        size(filter(col("mb"), b => b < col("monetary_cents").cast("double")))
          .cast("long") + 1L)
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
      .orderBy("o_custkey")
  }

  /** q_lorenz — Lorenz curve of customer revenue concentration: per
    * revenue decile the customer count, exact cent sum, and (cumulative)
    * permille share — the inequality PROFILE behind the single number
    * `q_source_gini` reports (which deciles carry the mass; "top decile
    * = 17% of revenue" is the actionable form). Each decile boundary is
    * the TYPE-1 order statistic at position ⌈k·n/10⌉ of the (cents,
    * custkey) total order — a pure integer, so the boundary comparison
    * is int64 < int64 on both engines and no cross-engine float
    * interpolation can ever decide a customer's decile (an earlier
    * interpolated-percentile form rested on Spark and DuckDB producing
    * bit-identical interpolated doubles).
    *
    * Scale discipline is the [[graft.operators.Ranks]] two-phase one —
    * per-customer revenue cents are near-unique, so a distinct-value
    * histogram gives NO reduction and its cumulative window would drag
    * every customer through one task. Instead $10k cent bands aggregate
    * map-side, only the 9 straddling buckets are ranked, and the picked
    * boundaries broadcast back onto the per-customer table — never a
    * global ntile/rank/cum sort over customers; shares are integer
    * permille of exact cent sums; the cumulative share window is a
    * bounded 10-row frame (the q_benford discipline). */
  def qLorenz(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir).groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
      .localCheckpoint(eager = false) // feeds offsets, picks + assign
    val bucket = expr("cents div 1000000")
    val offs = graft.operators.Ranks.bucketOffsets(per, Seq(), bucket)
    val dk = s.range(1, 10).select(col("id").as("k"))
    val positions = graft.operators.Ranks.totals(offs, Seq())
      .crossJoin(broadcast(dk))
      .select(col("k"), expr("(k * n + 9) div 10").as("pos"))
    val picked = graft.operators.Ranks.orderStatAt(per, Seq(), bucket,
      Seq(col("cents"), col("o_custkey")), "cents", offs, positions,
      "pos", "b")
    val bounds = picked
      .agg(array_sort(collect_list(struct(col("k"), col("b")))).as("kb"))
      .select(transform(col("kb"), e => e.getField("b")).as("qs"))
    val assigned = per.crossJoin(broadcast(bounds))
      .withColumn("decile", lit(1L) +
        size(filter(col("qs"), q => q < col("cents"))).cast("long"))
    val agg = assigned.groupBy("decile")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("rev_cents"))
    val tot = agg.agg(sum("rev_cents").as("total"))
    agg.crossJoin(broadcast(tot))
      .withColumn("share_permille", expr("(rev_cents * 1000) div total"))
      .withColumn("cum_share_permille",
        expr("(sum(rev_cents) OVER (ORDER BY decile) * 1000) div total"))
      .select("decile", "n_cust", "rev_cents", "share_permille",
        "cum_share_permille")
      .orderBy("decile")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lorenz" -> (qLorenz _),
    "q_rfm" -> (qRfm _),
    "q_agg_salted" -> (qAggSalted _),
    "q_agg_weighted" -> (qAggWeighted _),
    "q_agg_stats" -> (qAggStats _),
    "q_agg_collect" -> (qAggCollect _),
    "q_agg_percentile" -> (qAggPercentile _),
    "q_agg_approx_pct" -> (qAggApproxPct _),
    "q_agg_hash" -> (qAggHash _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_approx" -> (qAggApprox _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_gsets" -> (qAggGsets _),
    "q_agg_minmax_by" -> (qAggMinmaxBy _))

  override val oracle: Map[String, String] = Map(
    // Lorenz: type-1 decile boundaries from the value histogram (min v
    // with cum >= ceil(k*n/10)) — all-integer, interpolation-free.
    "q_lorenz" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |gv AS (SELECT cents, COUNT(*) AS cnt FROM per GROUP BY cents),
        |cum AS (
        |  SELECT cents, SUM(cnt) OVER (ORDER BY cents) AS cum,
        |    SUM(cnt) OVER () AS n
        |  FROM gv),
        |dk AS (SELECT CAST(k AS BIGINT) AS k FROM range(1, 10) t(k)),
        |bk AS (
        |  SELECT k, MIN(cents) AS b FROM cum CROSS JOIN dk
        |  WHERE cum >= (k * n + 9) // 10 GROUP BY k),
        |b AS (SELECT list(b ORDER BY k) AS qs FROM bk),
        |assigned AS (
        |  SELECT cents,
        |    1 + len(list_filter(b.qs, q -> q < cents)) AS decile
        |  FROM per, b),
        |agg AS (
        |  SELECT decile, COUNT(*) AS n_cust, SUM(cents) AS rev
        |  FROM assigned GROUP BY decile),
        |tot AS (SELECT SUM(rev) AS total FROM agg)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(n_cust AS BIGINT) AS n_cust, CAST(rev AS BIGINT) AS rev_cents,
        |  CAST((rev * 1000) // total AS BIGINT) AS share_permille,
        |  CAST((SUM(rev) OVER (ORDER BY decile) * 1000) // total AS BIGINT)
        |    AS cum_share_permille
        |FROM agg, tot ORDER BY decile""".stripMargin,
    // KMV approximate distinct: 12 md5 hex digits -> 48-bit hash, k-bounded
    // rank window, pure-integer estimate — reproduces bit-for-bit.
    "q_agg_approx" ->
      """WITH hv AS (
        |  SELECT DISTINCT event_type AS g,
        |    CAST(list_sum(list_transform(range(1, 13), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)),
        |          CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        << (4 * (12 - CAST(i AS INTEGER))))) AS BIGINT) AS h
        |  FROM events),
        |r AS (
        |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        |  FROM hv),
        |a AS (
        |  SELECT g, COUNT(*) AS cnt, MAX(h) AS h_k
        |  FROM r WHERE rn <= 64 GROUP BY g)
        |SELECT g AS event_type,
        |  CAST(CASE WHEN cnt < 64 THEN cnt
        |    ELSE (CAST(63 AS BIGINT) * 281474976710656) // h_k END
        |    AS BIGINT) AS approx_users
        |FROM a ORDER BY event_type""".stripMargin,
    // RFM: quantile_cont mirrors Spark's exact percentile; boundary
    // comparisons cast to double identically on both sides.
    "q_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    MAX(CAST(o_orderdate AS DATE)) AS last_order,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |anch AS (SELECT MAX(last_order) AS anchor FROM per),
        |p2 AS (
        |  SELECT o_custkey,
        |    date_diff('day', last_order, anchor) AS recency_days,
        |    frequency, monetary_cents
        |  FROM per CROSS JOIN anch),
        |b AS (
        |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |    quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |    quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8]) AS mb
        |  FROM p2),
        |sc AS (
        |  SELECT o_custkey, recency_days, frequency, monetary_cents,
        |    5 - len(list_filter(rb,
        |      x -> x < CAST(recency_days AS DOUBLE))) AS r_score,
        |    len(list_filter(fb,
        |      x -> x < CAST(frequency AS DOUBLE))) + 1 AS f_score,
        |    len(list_filter(mb,
        |      x -> x < CAST(monetary_cents AS DOUBLE))) + 1 AS m_score
        |  FROM p2 CROSS JOIN b)
        |SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
        |  CAST(frequency AS BIGINT) AS frequency,
        |  CAST(monetary_cents AS BIGINT) AS monetary_cents,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
        |FROM sc ORDER BY o_custkey""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag AS k,
        |  SUM(l_quantity) AS sum_value, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_stats" ->
      """WITH sums AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ss
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (ss - s * s / n) / (n - 1) AS var_qty,
        |  sqrt((ss - s * s / n) / (n - 1)) AS std_qty
        |FROM sums ORDER BY l_returnflag""".stripMargin,
    "q_agg_collect" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.75) AS p75_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Sample percentile: membership is 12 md5 hex digits of the row key
    // mod 10; the percentile over the sample is the exact interpolated one.
    "q_agg_approx_pct" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_quantity, l_extendedprice,
        |    (CAST(list_sum(list_transform(range(1, 13), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
        |            CAST(l_linenumber AS VARCHAR)),
        |          CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        << (4 * (12 - CAST(i AS INTEGER))))) AS BIGINT) % 10 = 0)
        |      AS in_sample
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  quantile_cont(CASE WHEN in_sample THEN l_quantity END, 0.5)
        |    AS med_qty,
        |  quantile_cont(CASE WHEN in_sample THEN l_extendedprice END, 0.25)
        |    AS p25_price,
        |  COUNT(*) AS n
        |FROM l GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Weighted mean over cent-quantized integral doubles: every partial
    // sum exact below 2^53 in any order, final divide identical IEEE.
    "q_agg_weighted" ->
      """SELECT l_returnflag,
        |  SUM(CAST(round(l_extendedprice * 100) AS DOUBLE) *
        |      CAST(l_quantity AS DOUBLE)) /
        |    SUM(CAST(l_quantity AS DOUBLE)) AS wavg_price_cents,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_gsets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_minmax_by" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn_top,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rn_bot
        |  FROM events)
        |SELECT user_id,
        |  MAX(CASE WHEN rn_top = 1 THEN event_id END) AS top_event,
        |  MAX(CASE WHEN rn_bot = 1 THEN event_id END) AS bottom_event,
        |  MAX(value) AS max_value, MIN(value) AS min_value
        |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin)
}
