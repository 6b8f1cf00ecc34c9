package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** B-5 window functions + B-6 sort/limit (SURVEY.md §2).
  *
  * Scale notes (100 TB): window queries shuffle once on the partition key and
  * sort within partitions — the partition keys here (c_mktsegment, user_id)
  * are either low-cardinality (fine: each group still fits an executor after
  * AQE) or high-cardinality user keys (ideal). Running/sliding frames are
  * computed in a single pass over the sorted partition. q_sort_limit is
  * planned as TakeOrderedAndProject: per-partition top-N + driver merge, no
  * global sort materialization.
  */
object Windows extends QueryFamily {

  /** q_window_rank — rank/dense_rank over ties, row_number with a total
    * tiebreak, per market segment by balance. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val byBal = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"))
    val total = Window.partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, dir).select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(byBal).as("rnk"),
        dense_rank().over(byBal).as("drnk"),
        row_number().over(total).as("rn"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** q_window_analytic — lag/lead deltas per user ordered by time: the
    * canonical consumer of syscol's counter stream (metric deltas).
    * Root: A1 tick stream, /root/reference/syscol/metrics_reporter.go:75-105. */
  def qWindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
        (col("value").cast("decimal(18,2)") -
          lag("value", 1).over(w).cast("decimal(18,2)"))
          .cast("double").as("delta"))
      .orderBy("event_id")
  }

  /** q_window_frame — running sum (rows frame), sliding 3-row sum, and a
    * 1-hour rangeBetween frame keyed on epoch seconds. */
  def qWindowFrame(s: SparkSession, dir: String): DataFrame = {
    val ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliding = ordered.rowsBetween(-2, Window.currentRow)
    val byEpoch = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .select(
        col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,2)")).over(running)
          .cast("double").as("running_sum"),
        sum(col("value").cast("decimal(18,2)")).over(sliding)
          .cast("double").as("sliding3_sum"),
        sum(col("value").cast("decimal(18,2)")).over(byEpoch)
          .cast("double").as("hour_sum"))
      .orderBy("event_id")
  }

  /** q_topk_group — top-3 per group via row_number ≤ k. */
  def qTopkGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rn")
  }

  /** q_window_dist — distribution window functions: ntile buckets,
    * percent_rank, cume_dist per market segment by balance. */
  def qWindowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, dir).select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** q_resample_ffill — time-series resampling with forward fill: every
    * (user, day) grid cell carries the user's last event value at-or-before
    * the end of that day — the canonical gap-filling consumer of syscol's
    * metric stream (counters sampled to a regular grid). Same union+window
    * formulation as q_join_asof: ONE shuffle on user_id, one partition-local
    * sort, no per-cell candidate join — survives any grid × corpus scale. */
  def qResampleFfill(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val ev = events.select(
      col("user_id"), col("ts").as("t"), lit(0).as("side"),
      col("event_id"), col("value"),
      lit(null).cast("timestamp").as("day_start"))
    val grid = events.select(col("user_id")).distinct()
      .crossJoin(s.range(1).select(explode(expr(
        "sequence(timestamp'2024-01-01', timestamp'2024-01-30', interval 1 day)"))
        .as("day_start")))
      // probe at end-of-day: events at exactly the next midnight belong to
      // the next cell
      .select(col("user_id"),
        (col("day_start") + expr("INTERVAL 1 DAY") -
          expr("INTERVAL 1 MICROSECOND")).as("t"),
        lit(1).as("side"), lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"), col("day_start"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(
      when(col("side") === 0, struct(col("event_id"), col("value"))),
      ignoreNulls = true).over(w)
    ev.unionByName(grid)
      .withColumn("m", matched)
      .filter(col("side") === 1)
      .select(col("user_id"), col("day_start").cast("date").as("day"),
        col("m.value").as("last_value"), col("m.event_id").as("last_event"))
      .orderBy("user_id", "day")
  }

  /** q_sessionize — batch sessionization: events more than 30 minutes
    * apart start a new session; session_id = running count of gap-breaks
    * per user. Two stacked windows over the SAME (user_id, ts) ordering —
    * one shuffle, one sort, both windows computed in a single pass. The
    * streaming analog is S3 (session_window). */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapBreak = when(
      unix_micros(col("ts")) -
        unix_micros(lag("ts", 1).over(byTime)) > 30L * 60 * 1000000, 1)
      .otherwise(0)
    Tables.events(s, dir)
      .withColumn("new_session", gapBreak)
      .withColumn("session_id",
        sum(col("new_session")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "session_id")
      .orderBy("event_id")
  }

  /** q_sort_limit — global order-by + limit (TakeOrderedAndProject). */
  def qSortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(25)

  /** q_funnel — ordered conversion funnel signup → view → click →
    * purchase: per stage, users reaching it (each stage strictly after
    * the previous one's first completion), conversion permille from
    * stage 1, and the exact-integer average journey seconds. K−1 hash
    * joins on the user key, no per-user event arrays — see
    * [[graft.operators.Funnel]]. */
  def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnelStages(Tables.events(s, dir),
      "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase"))

  /** q_dau_stickiness — weekly engagement rollup: per ISO week the
    * distinct weekly actives (WAU), the summed daily actives, observed
    * days, and stickiness = avg-DAU/WAU in permille (the "how many of
    * this week's users show up on a given day" ratio). Two exact
    * distinct aggregates — per-(week, day) then per-week — each one
    * shuffle on the user key with map-side partials; at 100 TB the
    * documented swap is approx_count_distinct. Integral-permille
    * division, exact in both engines. */
  def qDauStickiness(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      date_trunc("week", col("ts")).cast("date").as("week"),
      to_date(col("ts")).as("day"), col("user_id"))
    val dau = ev.groupBy("week", "day")
      .agg(countDistinct("user_id").as("dau"))
      .groupBy("week")
      .agg(count(lit(1)).as("n_days"), sum("dau").as("sum_dau"))
    val wau = ev.groupBy("week").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "week")
      .select(col("week"), col("n_days"), col("wau"), col("sum_dau"),
        expr("(1000 * sum_dau) div (n_days * wau)").as("stickiness_permille"))
      .orderBy("week")
  }

  /** q_concurrency — peak simultaneously-open sessions per hour via the
    * two-phase sweep line (sessionize → interval deltas → bucketed running
    * sum + bounded offset table). The capacity-planning read of the event
    * stream; see [[graft.operators.Temporal.maxConcurrency]]. */
  def qConcurrency(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.maxConcurrency(Tables.events(s, dir),
      "user_id", "ts", "event_id", gapMinutes = 30)

  /** q_ewma — per-user dyadic-decay moving average (α=½ EWMA truncated to
    * the last 16 points, integer-exact): the "current level, favouring
    * recent" trend read. See [[graft.operators.Temporal.dyadicEwma]]. */
  def qEwma(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.dyadicEwma(Tables.events(s, dir),
        "user_id", "ts", "event_id", "value", depth = 16)
      .orderBy("user_id")

  /** q_ohlc — per (event_type, day) candlestick bars with tie-pinned
    * open/close and micro-unit exact extremes/volume.
    * See [[graft.operators.Temporal.ohlcBars]]. */
  def qOhlc(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.ohlcBars(Tables.events(s, dir),
      "event_type", "ts", "event_id", "value")

  /** q_attribution — last-touch marketing attribution: conversions
    * credited to the newest view/click at-or-before them within 7 days
    * (else 'direct'), rolled up per channel with exact conversion value.
    * See [[graft.operators.Temporal.lastTouchAttribution]]. */
  def qAttribution(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.lastTouchAttribution(Tables.events(s, dir),
      "user_id", "ts", "event_id", "value",
      touchTypes = Seq("view", "click"), conversionType = "purchase",
      typeCol = "event_type", windowDays = 7)

  /** q_burstiness — per-user inter-event burstiness B = (σ−μ)/(σ+μ)
    * (Goh & Barabási 2008): metronome −1, Poisson 0, bursts → 1 — the
    * bot/scraper tell. See [[graft.operators.Temporal.burstiness]]. */
  def qBurstiness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.burstiness(Tables.events(s, dir),
      "user_id", "ts", "event_id", minGaps = 2)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_attribution" -> (qAttribution _),
    "q_burstiness" -> (qBurstiness _),
    "q_concurrency" -> (qConcurrency _),
    "q_ewma" -> (qEwma _),
    "q_ohlc" -> (qOhlc _),
    "q_dau_stickiness" -> (qDauStickiness _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_analytic" -> (qWindowAnalytic _),
    "q_window_frame" -> (qWindowFrame _),
    "q_window_dist" -> (qWindowDist _),
    "q_resample_ffill" -> (qResampleFfill _),
    "q_sessionize" -> (qSessionize _),
    "q_topk_group" -> (qTopkGroup _),
    "q_sort_limit" -> (qSortLimit _),
    "q_funnel" -> (qFunnel _))

  /** Generated 16-lag EWMA oracle — the lag ladder is built by the same
    * loop as the engine's, so weights agree by construction. */
  private def ewmaOracleSql(depth: Int): String = {
    val lagCols = (0 until depth)
      .map(k => s"LAG(v, $k) OVER w AS l$k").mkString(",\n    ")
    val num = (0 until depth)
      .map(k => s"COALESCE(l$k * ${1L << (depth - 1 - k)}, 0)")
      .mkString(" + ")
    val den = (0 until depth)
      .map(k =>
        s"CASE WHEN l$k IS NOT NULL THEN ${1L << (depth - 1 - k)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
       |  FROM events),
       |lagged AS (
       |  SELECT user_id, v,
       |    ROW_NUMBER() OVER w AS rn,
       |    COUNT(*) OVER (PARTITION BY user_id) AS cnt,
       |    $lagCols
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, CAST(cnt AS BIGINT) AS n_events, v AS last_micro,
       |  CAST(($num) // ($den) AS BIGINT) AS ewma_micro
       |FROM lagged WHERE rn = cnt ORDER BY user_id""".stripMargin
  }

  override val oracle: Map[String, String] = Map(
    "q_attribution" ->
      """WITH base AS (
        |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |    event_id AS id, event_type, value
        |  FROM events),
        |st AS (
        |  SELECT u, t, 0 AS side, id, event_type AS channel,
        |    CAST(0 AS BIGINT) AS v
        |  FROM base WHERE event_type IN ('view', 'click')
        |  UNION ALL
        |  SELECT u, t, 1, id, NULL,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT)
        |  FROM base WHERE event_type = 'purchase'),
        |marked AS (
        |  SELECT u, t, side, v,
        |    LAST_VALUE(CASE WHEN side = 0 THEN t END IGNORE NULLS)
        |      OVER w AS tt,
        |    LAST_VALUE(CASE WHEN side = 0 THEN channel END IGNORE NULLS)
        |      OVER w AS ch
        |  FROM st
        |  WINDOW w AS (PARTITION BY u ORDER BY t, side, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CASE WHEN tt IS NOT NULL AND t - tt <= 604800000000
        |    THEN ch ELSE 'direct' END AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(v) AS BIGINT) AS value_micro
        |FROM marked WHERE side = 1
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_burstiness" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) -
        |    LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |m AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(CAST(gap AS HUGEINT)) AS sx,
        |    SUM(CAST(gap AS HUGEINT) * gap) AS sxx
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1
        |  HAVING COUNT(*) >= 2),
        |d0 AS (
        |  SELECT user_id, n, sx,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS varnum
        |  FROM m),
        |d AS (
        |  SELECT user_id, n, sx,
        |    CAST(sx AS DOUBLE) / n AS mu,
        |    sqrt(CAST(varnum AS DOUBLE)) / n AS sigma
        |  FROM d0)
        |SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
        |  CAST(sx // n AS BIGINT) AS mean_gap_us,
        |  CASE WHEN sigma + mu > 0.0
        |    THEN CAST(floor(1000 * (sigma - mu) / (sigma + mu) + 0.5)
        |      AS BIGINT)
        |    ELSE NULL END AS burst_milli
        |FROM d ORDER BY user_id""".stripMargin,
    "q_ewma" -> ewmaOracleSql(16),
    "q_concurrency" ->
      """WITH numbered AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
        |      epoch_us(LAG(CAST(ts AS TIMESTAMP), 1)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess0 AS (
        |  SELECT user_id AS u, event_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM numbered),
        |sess AS (
        |  SELECT u, session_no, MIN(epoch_us(ts)) AS t_open,
        |    MAX(epoch_us(ts)) AS t_close
        |  FROM sess0 GROUP BY u, session_no),
        |deltas AS (
        |  SELECT t_open AS t, 0 AS kind, u, session_no, 1 AS d FROM sess
        |  UNION ALL
        |  SELECT t_close, 1, u, session_no, -1 FROM sess),
        |runs AS (
        |  SELECT t // 3600000000 AS bucket, d,
        |    SUM(d) OVER (ORDER BY t, kind, u, session_no
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM deltas)
        |SELECT CAST(bucket * 3600 AS BIGINT) AS hour_epoch_s,
        |  CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
        |  CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
        |  CAST(MAX(run) AS BIGINT) AS peak_concurrency
        |FROM runs GROUP BY bucket ORDER BY hour_epoch_s""".stripMargin,
    "q_ohlc" ->
      """WITH base AS (
        |  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT event_type, day, v,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, day
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type, day) AS cnt
        |  FROM base)
        |SELECT event_type, day,
        |  CAST(MAX(CASE WHEN rn = 1 THEN v END) AS BIGINT) AS open_micro,
        |  CAST(MAX(v) AS BIGINT) AS high_micro,
        |  CAST(MIN(v) AS BIGINT) AS low_micro,
        |  CAST(MAX(CASE WHEN rn = cnt THEN v END) AS BIGINT) AS close_micro,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(v) AS BIGINT) AS total_micro
        |FROM r GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    "q_dau_stickiness" ->
      """WITH ev AS (
        |  SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
        |      AS week,
        |    CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |dau AS (
        |  SELECT week, day, COUNT(DISTINCT user_id) AS dau
        |  FROM ev GROUP BY 1, 2),
        |wk AS (
        |  SELECT week, COUNT(*) AS n_days, SUM(dau) AS sum_dau
        |  FROM dau GROUP BY week),
        |wau AS (SELECT week, COUNT(DISTINCT user_id) AS wau
        |  FROM ev GROUP BY week)
        |SELECT week, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(wau AS BIGINT) AS wau, CAST(sum_dau AS BIGINT) AS sum_dau,
        |  CAST((1000 * sum_dau) // (n_days * wau) AS BIGINT)
        |    AS stickiness_permille
        |FROM wk JOIN wau USING (week) ORDER BY week""".stripMargin,
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_window_analytic" ->
      """SELECT event_id, user_id, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  CAST(CAST(value AS DECIMAL(18,2)) - LAG(CAST(value AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_window_frame" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding3_sum,
        |  -- floor(epoch), not CAST: Spark's unix_timestamp FLOORS to the
        |  -- second while a double->bigint CAST ROUNDS — sub-second rows at
        |  -- a 3600s frame edge would anchor one second apart (seen at sf0.1)
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_dist" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  NTILE(4) OVER w AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
        |      epoch_us(LAG(CAST(ts AS TIMESTAMP), 1)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_session,
        |    ts
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM flagged ORDER BY event_id""".stripMargin,
    "q_resample_ffill" ->
      """WITH days AS (
        |  SELECT d AS day_start
        |  FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30',
        |    INTERVAL 1 DAY) t(d)),
        |grid AS (
        |  SELECT u.user_id, days.day_start,
        |    days.day_start + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND AS probe
        |  FROM (SELECT DISTINCT user_id FROM events) u, days)
        |SELECT g.user_id, CAST(g.day_start AS DATE) AS day,
        |  o.value AS last_value, o.event_id AS last_event
        |FROM grid g LEFT JOIN LATERAL (
        |  SELECT event_id, value FROM events e
        |  WHERE e.user_id = g.user_id AND CAST(e.ts AS TIMESTAMP) <= g.probe
        |  ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) o ON true
        |ORDER BY g.user_id, day""".stripMargin,
    "q_topk_group" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |s1 AS (SELECT u, MIN(tus) AS t1 FROM e WHERE et = 'signup' GROUP BY u),
        |s2 AS (SELECT e.u AS u, t1, MIN(tus) AS t2 FROM e JOIN s1 ON e.u = s1.u
        |       WHERE et = 'view' AND tus > t1 GROUP BY e.u, t1),
        |s3 AS (SELECT e.u AS u, t1, MIN(tus) AS t3 FROM e JOIN s2 ON e.u = s2.u
        |       WHERE et = 'click' AND tus > t2 GROUP BY e.u, t1),
        |s4 AS (SELECT e.u AS u, t1, MIN(tus) AS t4 FROM e JOIN s3 ON e.u = s3.u
        |       WHERE et = 'purchase' AND tus > t3 GROUP BY e.u, t1),
        |per AS (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS stage_name,
        |    COUNT(*) AS users_reached, SUM(CAST(0 AS HUGEINT)) AS j_us FROM s1
        |  UNION ALL SELECT 2, 'view', COUNT(*),
        |    SUM(CAST(t2 - t1 AS HUGEINT)) FROM s2
        |  UNION ALL SELECT 3, 'click', COUNT(*),
        |    SUM(CAST(t3 - t1 AS HUGEINT)) FROM s3
        |  UNION ALL SELECT 4, 'purchase', COUNT(*),
        |    SUM(CAST(t4 - t1 AS HUGEINT)) FROM s4),
        |base AS (SELECT users_reached AS r1 FROM per WHERE stage = 1)
        |SELECT stage, stage_name, users_reached,
        |  CASE WHEN r1 > 0
        |    THEN CAST((users_reached * 1000) // r1 AS BIGINT)
        |    ELSE 0 END AS conv_permille,
        |  CASE WHEN users_reached > 0
        |    THEN CAST((j_us // 1000000) // users_reached AS BIGINT)
        |    ELSE NULL END AS avg_s_from_start
        |FROM per CROSS JOIN base ORDER BY stage""".stripMargin)
}
