package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query steady-state seconds.
  *
  * Hygiene (VERDICT r1): a full untimed warm-up pass first (JIT + codegen
  * compilation otherwise lands on whichever queries run first and dwarfs the
  * plan cost), stable alphabetical order, and failures surface as an `errors`
  * map instead of being swallowed into a fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // MEASURED AND REJECTED (optimization r14, guide §3.1): preferring
      // shuffled-hash join (`spark.sql.join.preferSortMergeJoin=false` +
      // `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m`).
      // jstack put the heavy pair/graph queries' time in SMJ TimSort +
      // per-key row buffering, but the paired A/B went the other way:
      // q_triangles 20.3 s (SMJ) vs 42.0 s (SHJ) adjacent-run, and the
      // 13-query join-heavy set regressed broadly (q_basket_pairs 1.8x,
      // q_ppjoin 1.4x, q_containment 1.35x). These joins are
      // duplicate-key-dense (wedges, shingle bands, basket pairs): SMJ
      // streams each sorted duplicate group once, while SHJ re-probes a
      // per-partition map whose buckets hold the same heavy groups —
      // sort cost < probe-chain cost on this shape. Kept default ON.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional first arg: comma-separated query filter for targeted timing
    // during development; the driver invokes with no args → full suite.
    val (names, badFilter) = args.headOption match {
      case Some(filter) =>
        val want = filter.split(",").map(_.trim).toSet
        (SparkEntry.queries.keys.toSeq.filter(want).sorted,
          (want -- SparkEntry.queries.keySet).toSeq.sorted)
      case None => (SparkEntry.queries.keys.toSeq.sorted, Seq.empty[String])
    }
    // Timing via count(): Catalyst prunes the final total-order `orderBy`
    // every registered query carries for ORACLE determinism (a range
    // exchange that is comparison plumbing, not workload). A `noop`-sink
    // run (full plan incl. those sorts) measured ~7x higher uniformly —
    // same ranking, inflated by sort cost no real consumer pays. Column
    // pruning slightly understates scan width; noted and accepted.
    def run(name: String): Option[String] =
      try { SparkEntry.queries(name)(spark, sfDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    // Each query is independent; drop its localCheckpoint blocks before
    // the next one runs. Without this the block manager accumulates
    // every prior query's checkpointed RDDs across the 3 × 221-query
    // passes and the heavy late-alphabet joins (q_ppjoin, q_triangles)
    // paid eviction + GC pressure other queries caused — measured ~2x
    // inflation vs a solo run. BLOCKING removal, and OUTSIDE the timed
    // region: the removal of a big checkpoint is itself seconds of work
    // that belongs to the harness, not the query (q_winnow read 3-5x
    // its solo time when the unpersist sat inside its timing).
    def cleanup(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // Bounded low-core mode (optimization r15, VERDICT r14 item 3): the
    // driver ALSO runs the bench at a low core count for scaling evidence,
    // and the full 1-warmup + 2-timed-pass protocol cannot finish inside
    // its timeout there (BENCH_r14_c8.json: rc=124, tail mid-suite — no
    // scaling data at all for six rounds). At <=8 cores the timed passes
    // default to ONE; the warm-up pass stays (JIT/codegen otherwise lands
    // in the first timed pass). Both counts are env-overridable
    // (SPARK_GRAFT_BENCH_WARMUP / SPARK_GRAFT_BENCH_PASSES) and the
    // 32-core protocol is byte-identical to r09-r14: warmup 1, passes 2,
    // per-query min.
    val warmups = sys.env.get("SPARK_GRAFT_BENCH_WARMUP").map(_.toInt)
      .getOrElse(1)
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt)
      .getOrElse(if (cpus.toInt <= 8) 1 else 2)
    // warm-up: JIT, codegen, footers
    (1 to warmups).foreach(_ => names.foreach { n => run(n); cleanup() })
    // Timed passes (default two), report the per-query MIN: transient host
    // noise (observed multi-second spikes on trivial queries) inflates
    // single samples; the min of two is a far better plan-cost estimate.
    def pass(): Map[String, (Double, Option[String])] = names.map { name =>
      val t0 = System.nanoTime()
      val err = run(name)
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      name -> (dt, err)
    }.toMap
    val allPasses = (1 to math.max(passes, 1)).map(_ => pass())
    val timed = names.map { name =>
      val rs = allPasses.map(_(name))
      (name, rs.map(_._1).min, rs.flatMap(_._2).headOption)
    }
    def q(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // Perf-regression ledger: per-query sf0.1 seconds recorded in
    // src/main/resources/bench_baseline.json. A query >1.5x its recorded
    // time (and >0.25s absolute — sub-second queries are host-noise-bound)
    // is flagged LOUDLY in the JSON line and on stderr, so drift is
    // attributed the round it happens instead of rediscovered by a later
    // verdict. New queries simply aren't in the ledger yet; refresh the
    // fixture when intentionally changing a query's plan.
    val baseline: Map[String, Double] =
      try {
        val src = scala.io.Source.fromInputStream(
          getClass.getResourceAsStream("/bench_baseline.json"))
        val text = try src.mkString finally src.close()
        """"(q_[A-Za-z0-9_]+)"\s*:\s*([0-9.Ee+-]+)""".r
          .findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    // Host-drift normalization: a loaded host slows EVERY query by a
    // near-uniform factor (the r7 driver run drifted ~1.4x across untouched
    // trivial projections and flagged 28 false regressions). The run's
    // MEDIAN time/ledger ratio over well-measurable queries estimates that
    // factor; the gate compares against baseline*drift, so uniform load
    // cancels and only plan-SPECIFIC drift flags. The drift itself is
    // reported in the JSON line — a genuine global regression (config
    // change slowing everything) surfaces as an anomalous host_drift, not
    // silence. Drift never relaxes below 1.0: on a fast host a 1.5x-over
    // query is a real regression regardless.
    // Drift is only meaningful on the FULL sf0.1 suite (the same
    // apples-to-apples condition the regression gate uses): a filtered
    // run pays JIT warm-up on fewer queries and reads 1.4x+ hot ratios
    // that say nothing about the host.
    val ratios =
      if (!sfDir.contains("sf0.1") || args.nonEmpty) Seq.empty[Double]
      else timed.collect {
        case (name, t, None) if baseline.get(name).exists(_ > 0.2) =>
          t / baseline(name)
      }.sorted
    val hostDrift =
      if (ratios.isEmpty) 1.0 else ratios(ratios.length / 2)
    val norm = math.max(hostDrift, 1.0)
    // The normalization is blind to a GENUINE uniform regression by
    // construction (it cancels uniform drift, whatever its cause) — so an
    // anomalous drift must itself alarm, loudly, not sit silently in a
    // JSON field: a drifted run demands either a quiet-host rerun or a
    // bisect of whatever changed globally.
    // Two tiers: a hard alert at 1.3x, and a soft warning from 1.1x — the
    // normalization would otherwise silently accept any GENUINE uniform
    // regression inside the (1.0, 1.3) window (e.g. a config change slowing
    // everything 1.25x reads as norm=1.25, zero flags, no alert).
    val driftAlert = hostDrift > 1.3
    if (driftAlert) System.err.println(
      f"HOST DRIFT $hostDrift%.2fx vs ledger across the suite: host load OR " +
        "a uniform regression (a global config/code change). Rerun on a " +
        "quiet host before trusting n_regressions=0.")
    else if (hostDrift > 1.1) System.err.println(
      f"HOST DRIFT WARNING $hostDrift%.2fx vs ledger: inside the tolerated " +
        "window, but a uniform regression would hide here — compare " +
        "host_drift against the committed drift history before accepting.")
    // Only the FULL suite compares apples-to-apples: a filtered run pays
    // JVM/JIT warm-up on far fewer queries and reads hot where the
    // recording read warm, inflating 2x+ on fit-heavy queries. The ledger
    // is also a 32-CORE artifact: at a low core count per-query scaling is
    // heterogeneous (scan-bound queries slow ~linearly, shuffle-bound ones
    // barely), so the median-ratio normalization cannot separate "scales
    // worse than median" from "regressed" — the gate (and its retry pass)
    // only runs at the recording condition.
    val gateActive = sfDir.contains("sf0.1") && args.isEmpty &&
      cpus.toInt == 32
    val firstFlags =
      if (!gateActive) Seq.empty
      else BenchGate.regressions(timed, baseline, norm)
    // Transient re-check (r13 verdict item 2): a host stall mid-suite
    // inflates whatever ran during its window — r13 flagged 10 adjacent
    // late-alphabet queries at host_drift 0.98, none of whose code had
    // changed. Any non-empty flag set triggers ONE same-JVM re-run of
    // just the flagged queries (seconds — they are the minority), and
    // each keeps its min: a transient evaporates on the quiet re-run,
    // while a genuine plan regression reproduces and still flags. The
    // contiguous-block signature is reported so a verdict can tell the
    // two shapes apart even when the re-run still flags.
    val wasBlock = BenchGate.contiguousBlock(names, firstFlags.map(_._1))
    val (finalTimed, regressions) =
      if (firstFlags.isEmpty) (timed, firstFlags)
      else {
        System.err.println(s"RE-CHECKING ${firstFlags.size} flagged " +
          s"quer${if (firstFlags.size == 1) "y" else "ies"} in-JVM " +
          s"(contiguous_block=$wasBlock): " +
          firstFlags.map(_._1).mkString(", "))
        val retry = firstFlags.map { case (name, _, _) =>
          val t0 = System.nanoTime()
          val err = run(name)
          val dt = (System.nanoTime() - t0) / 1e9
          cleanup()
          name -> (dt, err)
        }.toMap
        val folded = BenchGate.foldRetry(timed, retry)
        (folded, BenchGate.regressions(folded, baseline, norm))
      }
    regressions.foreach { case (name, t, b) =>
      System.err.println(f"PERF REGRESSION: $name took $t%.2fs vs recorded $b%.2fs (${t / b}%.2fx raw, host drift $hostDrift%.2fx) — survived a same-JVM re-run")
    }
    // Errors from FINAL timings (post-retry), so a failure the retry
    // surfaced on a suite-passing query still lands in the machine-read
    // map; typo'd filter names land here too — a filter that matched
    // nothing must not masquerade as an instant-pass bench.
    val errs = (finalTimed.collect { case (k, _, Some(e)) => s"${q(k)}:${q(e)}" }
      ++ badFilter.map(n => s"${q(n)}:${q("unknown query name in filter")}"))
      .mkString("{", ",", "}")
    val nErrors = finalTimed.count(_._3.isDefined) + badFilter.size
    val qsF = finalTimed.map { case (k, v, _) => s"${q(k)}:$v" }
      .mkString("{", ",", "}")
    val totalF = finalTimed.map(_._2).sum
    val regs = regressions
      .map { case (k, t, b) => s"${q(k)}:[$t,$b]" }.mkString("{", ",", "}")
    val jsonLine = s"""{"metric":"total","value":$totalF,"unit":"sec","n_errors":$nErrors,"n_regressions":${regressions.size},"n_flag_transient":${firstFlags.size - regressions.size},"flag_block":$wasBlock,"host_drift":$hostDrift,"drift_alert":$driftAlert,"cpus":$cpus,"warmup_passes":$warmups,"timed_passes":$passes,"queries":$qsF,"errors":$errs,"regressions":$regs,"sf":"$sfDir"}"""
    // Driver contract repair (optimization r15, VERDICT r14 item 2): the
    // driver has NEVER parsed this line (BENCH_r09..r14: parsed=null) —
    // sbt's `[success]` epilogue followed it on stdout (suppressed via
    // build.sbt showSuccess=false) and only a 2000-char tail survives
    // capture. Mirror the full JSON to a file so the numbers are readable
    // even if stdout is truncated: $SPARK_GRAFT_BENCH_OUT if set, else
    // bench_out.json in the CWD. Best-effort — a read-only checkout must
    // not fail the bench.
    try {
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_out.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (jsonLine + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(_) => () }
    // Committed drift history (tools/drift_history.jsonl): one line per
    // full-suite run, so cross-round BENCH comparisons can attribute "got
    // uniformly faster/slower" to host load from a file instead of
    // re-deriving it each verdict. Best-effort append — a read-only
    // checkout must not fail the bench.
    if (gateActive) try { // full sf0.1 suite at the 32-core ledger condition
      val line = s"""{"ts":"${java.time.Instant.now()}","n":${names.size},""" +
        s""""total_sec":${math.round(totalF * 1000) / 1000.0},""" +
        s""""host_drift":${math.round(hostDrift * 1000) / 1000.0},""" +
        s""""n_regressions":${regressions.size},"n_errors":$nErrors}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get("tools/drift_history.jsonl"),
        (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
    // The one-line JSON is printed AFTER spark.stop() so nothing the
    // shutdown path might write to stdout can land after it: this line
    // must be the LAST stdout line of the run (the driver parses it).
    println(jsonLine)
    System.out.flush()
    // A bench with erroring queries must fail loudly: BENCH_r05 reported
    // rc=0 with 5 broken queries and nobody noticed until the verdict.
    if (nErrors > 0) sys.exit(1)
  }
}
