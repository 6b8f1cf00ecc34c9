package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.{col, conv, md5, row_number, substring}
import graft.streaming.{DocIngest, DocSourced, FunnelEvent, SeenDoc, Streams, TaskEvent, Tick, VecIngest}

/** B-9 streaming semantics (SURVEY.md §2 S1–S7) with a deterministic
  * MemoryStream harness: windows close as the watermark advances, late data
  * is dropped, duplicates are suppressed, the keyed lifecycle honours the
  * Cluster invariants, and the foreachBatch envelope sink commits
  * per-batch parquet. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(s: Long): Timestamp = new Timestamp(s * 1000L)

  /** Stop a restart-exercising query only at a COMMIT BOUNDARY: wait
    * (bounded) until every batch the offset log has started is also in
    * the commit log, then stop. The transformWithState restart tests
    * reopen the checkpoint immediately, and their awaitRow-pattern waits
    * return as soon as foreachBatch lands rows in the sink — potentially
    * BEFORE that batch's commit/state-metadata writes finish, so the
    * immediate stop()'s thread interrupt could land mid-write and the
    * restarted run's StateSchemaAndOperatorMetadataRule validation read a
    * partial checkpoint (the one-off VERIFY_r14 tests_ok=false signature;
    * never reproduced across 7 local full-suite/loop runs, so this closes
    * the window rather than fixing a reproducible bug). The
    * processAllAvailable-pattern tests already drain before stopping and
    * are not exposed. */
  private def stopAtCommitBoundary(
      q: org.apache.spark.sql.streaming.StreamingQuery, ckpt: String): Unit = {
    def maxBatch(sub: String): Long = {
      val d = new java.io.File(ckpt, sub)
      Option(d.list()).map(_.toSeq.flatMap(_.toLongOption))
        .filter(_.nonEmpty).map(_.max).getOrElse(-1L)
    }
    val deadline = System.nanoTime() + 30e9.toLong
    while (maxBatch("commits") < maxBatch("offsets") &&
      System.nanoTime() < deadline) Thread.sleep(50L)
    q.stop()
  }

  /** Runs the stream; the feed callback gets a step() that forces the
    * pending data into its own micro-batch (watermarks only advance at
    * batch boundaries — a single coalesced batch would never drop late
    * data). */
  private def runQuery(df: org.apache.spark.sql.DataFrame, mode: OutputMode,
      name: String)(feed: (() => Unit) => Unit): Array[org.apache.spark.sql.Row] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try { feed(() => q.processAllAvailable()); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).collect()
  }

  test("S1 tumbling window closes when the watermark passes (late drop)") {
    val in = MemoryStream[Tick]
    val out = runQuery(Streams.tumbling(in.toDF(), "10 seconds", "10 seconds"),
      OutputMode.Append, "s1") { step =>
      in.addData(Tick("s0", t(1), 1.0, "{}"), Tick("s0", t(5), 2.0, "{}"))
      step()
      // advance event time far enough to close [0,10): watermark = 60-10=50
      in.addData(Tick("s0", t(60), 9.0, "{}"))
      step()
      // this record is older than the watermark → dropped, not re-opened
      in.addData(Tick("s0", t(3), 100.0, "{}"))
    }
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Timestamp]("w_start") === t(0))
    assert(r.getAs[Long]("n_ticks") === 2L)
    assert(r.getAs[Double]("sum_value") === 3.0)
  }

  test("S2 sliding window: one closed span contains both early ticks") {
    val in = MemoryStream[Tick]
    val out = runQuery(
      Streams.sliding(in.toDF(), "30 seconds", "10 seconds", "10 seconds"),
      OutputMode.Append, "s2") { step =>
      in.addData(Tick("s0", t(12), 1.0, "{}"), Tick("s0", t(25), 2.0, "{}"))
      step()
      in.addData(Tick("s0", t(120), 9.0, "{}"))
    }
    // spans [0,30) [10,40) [20,50) close; [10,40) holds 12 and 25
    val span10 = out.find(_.getAs[Timestamp]("w_start") === t(10))
    assert(span10.isDefined)
    assert(span10.get.getAs[Long]("n_ticks") === 2L)
    assert(out.forall(_.getAs[Timestamp]("w_start").getTime < 50000))
  }

  test("S3 session window merges gap-bounded ticks into one session") {
    val in = MemoryStream[Tick]
    val out = runQuery(
      Streams.session(in.toDF(), "10 seconds", "10 seconds"),
      OutputMode.Append, "s3") { step =>
      in.addData(Tick("s0", t(1), 1.0, "{}"), Tick("s0", t(5), 2.0, "{}"),
        Tick("s0", t(30), 3.0, "{}"))
      step()
      in.addData(Tick("s0", t(200), 9.0, "{}"))
    }
    // [1,5] merge (gap < 10s); 30 is its own session
    assert(out.length === 2)
    val first = out.minBy(_.getAs[Timestamp]("s_start").getTime)
    assert(first.getAs[Long]("n_ticks") === 2L)
    assert(first.getAs[Double]("sum_value") === 3.0)
  }

  test("S30 dynamic gap: the SAME 19s silence merges a vip session and splits a normal one") {
    val in = MemoryStream[Tick]
    val out = runQuery(
      Streams.sessionDynamicGap(in.toDF(), "vip", "30 seconds",
        "10 seconds", "10 seconds"),
      OutputMode.Append, "s30") { step =>
      // identical timestamps for both populations — only the per-row gap
      // expression distinguishes them
      in.addData(
        Tick("vip0", t(1), 1.0, "{}"), Tick("vip0", t(20), 2.0, "{}"),
        Tick("s0", t(1), 4.0, "{}"), Tick("s0", t(20), 8.0, "{}"))
      step()
      in.addData(Tick("vip0", t(200), 9.0, "{}"),
        Tick("s0", t(200), 9.0, "{}")) // advance both watermarks
    }
    val vip = out.filter(_.getAs[String]("slaveId") == "vip0")
    val std = out.filter(_.getAs[String]("slaveId") == "s0")
    // vip: 19s < 30s gap → ONE session holding both ticks
    assert(vip.length === 1)
    assert(vip(0).getAs[Long]("n_ticks") === 2L)
    assert(vip(0).getAs[Double]("sum_value") === 3.0)
    // normal: 19s > 10s gap → TWO single-tick sessions
    assert(std.length === 2)
    assert(std.forall(_.getAs[Long]("n_ticks") === 1L))
    assert(std.map(_.getAs[Double]("sum_value")).sorted === Seq(4.0, 8.0))
    // the session END reflects the row's own gap: vip end = last tick +
    // 30s, normal ends = tick + 10s
    assert(vip(0).getAs[Timestamp]("s_end") === t(50))
    assert(std.map(_.getAs[Timestamp]("s_end")).toSet ===
      Set(t(11), t(30)))
  }

  test("S31 event-time timers close sessions when the WATERMARK proves the gap") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Tick]
      // gap 10 s, watermark delay 10 s — all in EVENT time; wall-clock
      // never closes anything (the S14 contrast)
      val q = Streams.sessionizeEventTime(in.toDS(), gapMs = 10000L,
          watermark = "10 seconds").toDF()
        .writeStream.format("memory").queryName("s31")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s31").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s31").count() >= n, s"sink never reached $n rows")
      }
      try {
        in.addData(Tick("s0", t(1), 1.0, "{}"), Tick("s0", t(5), 2.0, "{}"))
        q.processAllAvailable() // timer armed at 15; wm = -5 — nothing fires
        assert(spark.table("s31").count() === 0L)
        // t(12) EXTENDS the session (re-arm 15 → 22); s9 seeds the
        // watermark clock
        in.addData(Tick("s0", t(12), 4.0, "{}"), Tick("s9", t(30), 16.0, "{}"))
        q.processAllAvailable() // wm now 20 < 22: s0 still open
        assert(spark.table("s31").count() === 0L)
        in.addData(Tick("s9", t(35), 32.0, "{}")) // s9 extends; wm → 25
        await(1) // wm 25 passes s0's 22: the 3-tick session closes
        // a NEW s0 session after the close (fresh state); wm → 40
        in.addData(Tick("s0", t(50), 8.0, "{}"))
        q.processAllAvailable()
        // extending s0 (re-arm 60 → 66) pushes wm to 46 > 45: s9's
        // session closes BEFORE s9 speaks again — an event arriving
        // before the watermark proves the gap would merge, by design
        in.addData(Tick("s0", t(56), 64.0, "{}"))
        await(2)
        in.addData(Tick("s9", t(80), 128.0, "{}")) // wm → 70 > 66
        await(3)
      } finally q.stop()
      val got = spark.table("s31")
        .select("slaveId", "n_ticks", "sum_value", "last_ts")
        .as[(String, Long, Double, Timestamp)].collect().toSet
      assert(got === Set(
        ("s0", 3L, 7.0, t(12)),   // 1+2 extended by 4; closed at wm > 22
        ("s0", 2L, 72.0, t(56)),  // the post-close session is FRESH state
        ("s9", 2L, 48.0, t(35)))) // s9's own first session (16+32)
      // s9's t(80) session never closes: the watermark never passes 90 —
      // emission is watermark-proven, not stop()-flushed
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S32 AvailableNow backfill drains in rate-limited batches, then stops; resume reads only new files") {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("s32_src").toString
    val out = java.nio.file.Files.createTempDirectory("s32_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s32_ckpt").toString
    def drop(name: String, ticks: (String, Int, Double)*): Unit =
      ticks.map { case (id, sec, v) => Tick(id, t(sec), v, "{}") }
        .toDF().coalesce(1).write.mode("overwrite").parquet(s"$src/$name")
    // three single-file drops BEFORE the first run
    drop("f1", ("s0", 1, 1.0)); drop("f2", ("s0", 2, 2.0))
    drop("f3", ("s1", 3, 4.0))
    val batchIds = collection.mutable.ArrayBuffer[Long]()
    def runOnce(): Unit = {
      val q = Streams.backfillTicks(spark, s"$src/*",
          maxFilesPerTrigger = 1) // rate limit ACROSS batches
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batchIds.synchronized { batchIds += id }
          df.write.mode("overwrite").parquet(s"$out/batch=$id")
        }
        .start()
      // AvailableNow terminates on its own once the start-time snapshot
      // is drained — the property Trigger.Once cannot give rate-limited
      assert(q.awaitTermination(120000L), "backfill did not self-stop")
    }
    runOnce()
    val first = spark.read.parquet(s"$out/batch=*")
    assert(first.count() === 3L)
    // maxFilesPerTrigger=1 over 3 files ⇒ at least 3 distinct batches
    assert(batchIds.distinct.size >= 3, s"got batches $batchIds")
    // two more files AFTER the first run; resume on the SAME checkpoint
    drop("f4", ("s1", 4, 8.0)); drop("f5", ("s0", 5, 16.0))
    runOnce()
    val all = spark.read.parquet(s"$out/batch=*")
      .select("slaveId", "value")
      .as[(String, Double)].collect().toSeq.sorted
    // exactly once across both invocations: nothing re-read, nothing lost
    assert(all === Seq(("s0", 1.0), ("s0", 2.0), ("s0", 16.0),
      ("s1", 4.0), ("s1", 8.0)))
  }

  test("S31 chaos: an armed event-time timer survives kill-and-resume") {
    // Kill the query with a session OPEN (state + registered timer in
    // RocksDB, changelog checkpointing on); the resumed incarnation must
    // recover BOTH — the session closes exactly once, with the pre-kill
    // aggregate, when the watermark finally passes the armed instant.
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = Seq(provider, changelog).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelog, "true")
    try {
      val dir = java.nio.file.Files.createTempDirectory("s31_chaos_out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("s31_chaos_ck").toString
      val in = MemoryStream[Tick]
      def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        df.write.mode("overwrite").parquet(s"$dir/batch=$id")
      def start() = Streams.sessionizeEventTime(in.toDS(), gapMs = 10000L,
          watermark = "10 seconds").toDF()
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(sink _)
        .start()
      val q1 = start()
      try {
        in.addData(Tick("s0", t(1), 1.0, "{}"), Tick("s0", t(5), 2.0, "{}"))
        q1.processAllAvailable() // timer armed at 15; session OPEN
      } finally q1.stop() // kill
      val q2 = start()
      try {
        // watermark clock: 40−10 = 30 passes the RECOVERED timer at 15
        in.addData(Tick("s9", t(40), 16.0, "{}"))
        q2.processAllAvailable()
        in.addData(Tick("s9", t(41), 32.0, "{}")) // firing batch
        q2.processAllAvailable()
      } finally q2.stop()
      val rows = spark.read.parquet(s"$dir/batch=*")
        .select("slaveId", "n_ticks", "sum_value")
        .as[(String, Long, Double)].collect().toSeq
      // exactly once, with the pre-kill aggregate — a lost timer emits
      // nothing; lost value state emits a wrong (or zero) aggregate
      assert(rows === Seq(("s0", 2L, 3.0)), s"got $rows")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("S5 streaming dedup drops duplicate (slaveId, ts) records") {
    val in = MemoryStream[Tick]
    val out = runQuery(Streams.dedup(in.toDF(), "10 seconds"),
      OutputMode.Append, "s5") { step =>
      in.addData(
        Tick("s0", t(1), 1.0, "{}"),
        Tick("s0", t(1), 99.0, "{}"), // duplicate key (slaveId, ts)
        Tick("s1", t(1), 2.0, "{}"))
      step()
      in.addData(Tick("s0", t(1), 50.0, "{}")) // cross-batch duplicate
    }
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("slaveId")).toSet === Set("s0", "s1"))
  }

  test("S6 keyed lifecycle: insert-if-absent, reject duplicate, remove on terminal") {
    val in = MemoryStream[TaskEvent]
    val out = runQuery(Streams.keyedLifecycle(in.toDS()).toDF(),
      OutputMode.Append, "s6") { step =>
      in.addData(
        TaskEvent("s0", "task-1", "launch", 1),
        TaskEvent("s0", "task-2", "launch", 2),   // occupied → rejected
        TaskEvent("s0", "task-1", "running", 3))  // no transition
      step()
      in.addData(
        TaskEvent("s0", "task-1", "failed", 4),   // terminal → removed
        TaskEvent("s0", "task-3", "launch", 5))   // key free again
    }
    val actions = out.map(r => (r.getAs[String]("taskId"),
      r.getAs[String]("action"))).toSeq
    assert(actions.contains(("task-1", "launched")))
    assert(actions.contains(("task-2", "rejected_duplicate")))
    assert(actions.contains(("task-1", "removed")))
    assert(actions.contains(("task-3", "launched")))
    assert(actions.length === 4) // 'running' emits nothing
  }

  test("S6 transformWithState lifecycle matches flatMapGroupsWithState") {
    // the processor-API formulation needs the RocksDB state store; scoped to
    // this query and restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TaskEvent]
      val out = runQuery(Streams.keyedLifecycleTws(in.toDS()).toDF(),
        OutputMode.Append, "s6tws") { step =>
        in.addData(
          TaskEvent("s0", "task-1", "launch", 1),
          TaskEvent("s0", "task-2", "launch", 2),   // occupied → rejected
          TaskEvent("s0", "task-1", "running", 3))  // no transition
        step()
        in.addData(
          TaskEvent("s0", "task-1", "failed", 4),   // terminal → removed
          TaskEvent("s0", "task-3", "launch", 5))   // key free again
      }
      val actions = out.map(r => (r.getAs[String]("taskId"),
        r.getAs[String]("action"))).toSeq
      // identical transitions to the flatMapGroupsWithState formulation
      assert(actions.toSet === Set(
        ("task-1", "launched"), ("task-2", "rejected_duplicate"),
        ("task-1", "removed"), ("task-3", "launched")))
      assert(actions.length === 4)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("S6 chaos: transformWithState kill-and-resume loses/duplicates no transition") {
    // Kill the query mid-lifecycle (slave occupied) and resume a NEW query
    // from the same checkpoint with RocksDB CHANGELOG checkpointing: the
    // recovered ValueState must still hold task-1 (its terminal event can
    // only produce "removed" if state survived), committed batches must not
    // re-emit, and the per-batchId-idempotent sink makes any replay
    // invisible — the exactly-once recipe, asserted end-to-end.
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = Seq(provider, changelog).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelog, "true")
    try {
      val dir = java.nio.file.Files.createTempDirectory("s6_chaos_out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("s6_chaos_ckpt").toString
      val in = MemoryStream[TaskEvent]
      def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        df.write.mode("overwrite").parquet(s"$dir/batch=$id")
      def start() = Streams.keyedLifecycleTws(in.toDS()).toDF()
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(sink _)
        .start()
      val q1 = start()
      try {
        in.addData(
          TaskEvent("s0", "task-1", "launch", 1),
          TaskEvent("s0", "task-2", "launch", 2)) // occupied → rejected
        q1.processAllAvailable()
      } finally q1.stop() // kill with task-1 still occupying s0
      val q2 = start()
      try {
        in.addData(
          TaskEvent("s0", "task-1", "failed", 3),  // removed IFF state recovered
          TaskEvent("s0", "task-3", "launch", 4))  // key free again after removal
        q2.processAllAvailable()
      } finally q2.stop()
      val rows = spark.read.parquet(s"$dir/batch=*")
        .select("taskId", "action").as[(String, String)].collect().toSeq
      // exact multiset across both incarnations: nothing lost, nothing doubled
      assert(rows.sorted === Seq(
        ("task-1", "launched"), ("task-1", "removed"),
        ("task-2", "rejected_duplicate"), ("task-3", "launched")).sorted)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("S16 shard assignment: per-source fluid fill persists across batches") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[DocSourced]
      val ts = new java.sql.Timestamp(0L)
      def doc(id: Long, nTok: Int, src: String) =
        DocSourced(id, ts, Seq.fill(nTok)("w").mkString(" "), src)
      val q = Streams.shardAssign(in.toDS(), budget = 10L).toDF()
        .writeStream.format("memory").queryName("s16")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s16").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s16").count() >= n, s"sink never reached $n rows")
      }
      try {
        // batch 1: source A fills 0..4 and 4..10 (shard 0 twice), B starts
        in.addData(doc(1L, 4, "A"), doc(2L, 6, "A"), doc(10L, 9, "B"))
        await(3)
        // batch 2: A continues at 10 (shard 1 opens), B crosses into 1
        in.addData(doc(3L, 5, "A"), doc(11L, 3, "B"))
        await(5)
      } finally q.stop()
      val got = spark.table("s16")
        .select("source", "doc_id", "n_tokens", "shard_seq", "start_tok")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        ("A", 1L, 4L, 0L, 0L), ("A", 2L, 6L, 0L, 4L),
        ("A", 3L, 5L, 1L, 10L), // the fill total survived the batch gap
        ("B", 10L, 9L, 0L, 0L), ("B", 11L, 3L, 0L, 9L)))
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S18 streaming funnel: strict-after advance, state across batches, skips ignored") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[FunnelEvent]
      val q = Streams.funnelProgress(in.toDS(), Seq("a", "b", "c")).toDF()
        .writeStream.format("memory").queryName("s18")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s18").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s18").count() >= n, s"sink never reached $n rows")
      }
      try {
        // batch 1: u1 starts; u2 does a+b at the SAME ts (strict > rejects
        // b); u3 leads with b (ignored — not the expected first stage)
        in.addData(FunnelEvent(1L, "a", 100L), FunnelEvent(2L, "a", 200L),
          FunnelEvent(2L, "b", 200L), FunnelEvent(3L, "b", 300L))
        await(2)
        // batch 2: u1 completes b then c ACROSS the batch gap (state
        // persisted); u1's repeat of a is ignored; u3's late a now counts
        in.addData(FunnelEvent(1L, "b", 110L), FunnelEvent(1L, "c", 130L),
          FunnelEvent(1L, "a", 140L), FunnelEvent(3L, "a", 310L))
        await(5)
      } finally q.stop()
      val got = spark.table("s18")
        .select("userId", "stage", "stageName", "tsMs", "sinceStartMs")
        .as[(Long, Int, String, Long, Long)].collect().toSet
      assert(got === Set(
        (1L, 1, "a", 100L, 0L), (1L, 2, "b", 110L, 10L),
        (1L, 3, "c", 130L, 30L),
        (2L, 1, "a", 200L, 0L),  // b at the same ts did NOT advance
        (3L, 1, "a", 310L, 0L))) // the early b never produced a row
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S19 CUSUM monitor: slow excess accumulates across batches, recovery drains") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[graft.streaming.SlotCount]
      val q = Streams.cusumMonitor(in.toDS(), expectedPerSlot = 10L,
        threshold = 15L).toDF()
        .writeStream.format("memory").queryName("s19")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s19").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s19").count() >= n, s"sink never reached $n rows")
      }
      import graft.streaming.SlotCount
      try {
        // batch 1: +2 excess per slot — under any per-slot threshold
        in.addData(SlotCount("k", 1000L, 12L), SlotCount("k", 2000L, 12L))
        await(2)
        // batch 2: the accumulation crosses 15 ONLY because S persisted
        // (4 + 6 + 6 = 16); then a quiet slot drains it back under
        in.addData(SlotCount("k", 3000L, 16L), SlotCount("k", 4000L, 16L),
          SlotCount("k", 5000L, 2L))
        await(5)
      } finally q.stop()
      val got = spark.table("s19")
        .select("slotMs", "cusum", "drift")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)
      assert(got.map(_._2).toSeq === Seq(2L, 4L, 10L, 16L, 8L))
      assert(got.map(_._3).toSeq === Seq(false, false, false, true, false))
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S20 level tracker: dyadic EWMA persists across batches, floors negatives") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[graft.streaming.MetricPoint]
      val q = Streams.levelTracker(in.toDS()).toDF()
        .writeStream.format("memory").queryName("s20")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s20").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s20").count() >= n, s"sink never reached $n rows")
      }
      import graft.streaming.MetricPoint
      try {
        // batch 1: seed with the first point, then halve toward the next
        in.addData(MetricPoint("k", 1000L, 100L), MetricPoint("k", 2000L, 50L))
        await(2)
        // batch 2: continues from persisted 75 → (75+25)/2 = 50; the
        // negative point floors: floorDiv(50 + (-101), 2) = -26, not -25
        in.addData(MetricPoint("k", 3000L, 25L), MetricPoint("k", 4000L, -101L))
        await(4)
      } finally q.stop()
      val got = spark.table("s20").select("tsMs", "ewmaMicro")
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(got.map(_._2).toSeq === Seq(100L, 75L, 50L, -26L))
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S21 attribution: touch state persists across batches; stale touch goes direct") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[graft.streaming.TouchEvent]
      val q = Streams.touchAttribution(in.toDS(),
          touchTypes = Set("view", "click"), conversionType = "purchase",
          windowMs = 10000L).toDF()
        .writeStream.format("memory").queryName("s21")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s21").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s21").count() >= n, s"sink never reached $n rows")
      }
      import graft.streaming.TouchEvent
      try {
        // batch 1: touch only — no output yet
        in.addData(TouchEvent(1L, 1000L, "click", 0L),
          // u2 converts with no touch at all → direct
          TouchEvent(2L, 1500L, "purchase", 500L))
        await(1)
        // batch 2: u1 converts 2 s after the PERSISTED touch → click;
        // then converts again 20 s later → outside window → direct
        in.addData(TouchEvent(1L, 3000L, "purchase", 700L),
          TouchEvent(1L, 23000L, "purchase", 900L))
        await(3)
      } finally q.stop()
      val got = spark.table("s21")
        .select("userId", "tsMs", "channel", "valueMicro")
        .as[(Long, Long, String, Long)].collect().sortBy(_._2)
      assert(got.toSeq === Seq((2L, 1500L, "direct", 500L),
        (1L, 3000L, "click", 700L), (1L, 23000L, "direct", 900L)))
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S13 TTL dedup: repeats drop within the TTL, pass again after eviction") {
    // ProcessingTime time-mode keeps the query triggering (empty) batches
    // continuously, so processAllAvailable never settles — drive ONE
    // long-lived query and poll the memory sink for the expected row
    // count instead. The 10 s TTL dwarfs the sub-second steady-state
    // batch latency (the dup check is safe) while one sleep crosses it.
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[SeenDoc]
      val q = Streams.dedupTtl(in.toDS(), ttlMs = 10000L).toDF()
        .writeStream.format("memory").queryName("s13")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s13").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s13").count() >= n, s"sink never reached $n rows")
      }
      try {
        in.addData(SeenDoc(1L, "dA"), SeenDoc(2L, "dA"), SeenDoc(3L, "dB"))
        await(3) // dA: first + in-batch dup; dB: first
        in.addData(SeenDoc(4L, "dA"))
        await(4) // well inside the TTL: dup
        Thread.sleep(12000L) // cross the 10 s TTL; the store evicts dA's mark
        in.addData(SeenDoc(5L, "dA"))
        await(5) // post-eviction repeat passes again
      } finally q.stop()
      val got = spark.table("s13")
        .select("doc_id", "action").as[(Long, String)].collect().toSet
      assert(got === Set(
        (1L, "first"), (2L, "dup"), (3L, "first"),
        (4L, "dup"),
        (5L, "first")))
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S14 watchdog: silent task times out via state-store timer, completed one does not") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TaskEvent]
      // The arming batch's processing timestamp is when the batch STARTS,
      // and the FIRST batch pays ~10 s of RocksDB cold-start — a short
      // timeout would expire before the disarm batch even runs. 20 s
      // dwarfs the cold-start while one await crosses it.
      val q = Streams.launchWatchdog(in.toDS(), timeoutMs = 20000L).toDF()
        .writeStream.format("memory").queryName("s14")
        .outputMode("append").start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (spark.table("s14").count() < n && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(spark.table("s14").count() >= n, s"sink never reached $n rows")
      }
      try {
        in.addData(
          TaskEvent("s0", "task-1", "launch", 1),
          TaskEvent("s1", "task-2", "launch", 2))
        await(2) // both watchdogs armed
        in.addData(TaskEvent("s0", "task-1", "finished", 3)) // disarms s0
        await(3)
        // s1 stays silent past the timeout: ONLY its timer must fire
        await(4)
      } finally q.stop()
      val got = spark.table("s14")
        .select("taskId", "action").as[(String, String)].collect().toSet
      assert(got === Set(
        ("task-1", "watchdog_armed"), ("task-2", "watchdog_armed"),
        ("task-1", "completed_in_time"),
        ("task-2", "timed_out")))
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  test("S9 continuous-ingest dedup: store dups and stream repeats dropped, novel survives") {
    val store = Seq((10L, "seen before"), (11L, "also seen"))
      .toDF("doc_id", "text")
    val in = MemoryStream[graft.streaming.DocIngest]
    val out = runQuery(
      Streams.incrementalDedup(in.toDF(), store),
      OutputMode.Append, "s9") { step =>
      in.addData(
        graft.streaming.DocIngest(20L, t(1), "seen before"), // in store
        graft.streaming.DocIngest(21L, t(2), "brand new"),   // survives
        graft.streaming.DocIngest(22L, t(3), "brand new"))   // stream repeat
      step()
      in.addData(
        graft.streaming.DocIngest(23L, t(5), "another new")) // survives
    }
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq.sorted
    assert(ids === Seq(21L, 23L))
  }

  test("S8 stream-stream join matches ticks to events within the time band") {
    val ticks = MemoryStream[Tick]
    val events = MemoryStream[(String, Timestamp, String)]
    val evDf = events.toDF().toDF("slaveId", "ev_ts", "status")
    val out = runQuery(Streams.streamStreamJoin(ticks.toDF(), evDf),
      OutputMode.Append, "s8") { step =>
      ticks.addData(Tick("s0", t(10), 1.0, "{}"),
        Tick("s0", t(100), 2.0, "{}"),  // outside the ±30 s band
        Tick("s1", t(12), 3.0, "{}"))   // different slave
      events.addData(("s0", t(20), "running"))
      step()
    }
    assert(out.length === 1)
    assert(out.head.getAs[String]("slaveId") === "s0")
    assert(out.head.getAs[Timestamp]("tick_ts") === t(10))
  }

  test("S17 left-outer stream join emits unmatched impressions after the watermark") {
    val imps = MemoryStream[Tick]
    val convs = MemoryStream[(String, Timestamp, String)]
    val cvDf = convs.toDF().toDF("slaveId", "cv_ts", "status")
    val out = runQuery(Streams.streamStreamLeftJoin(imps.toDF(), cvDf),
      OutputMode.Append, "s17") { step =>
      imps.addData(Tick("s0", t(10), 1.0, "{}"),  // converts at t(20)
        Tick("s1", t(12), 2.0, "{}"))             // never converts
      convs.addData(("s0", t(20), "click"))
      step()
      // advance event time on BOTH inputs: watermark must pass
      // t(12)+30s+30s lateness before s1's absence is a fact
      imps.addData(Tick("s9", t(500), 0.0, "{}"))
      convs.addData(("s9", t(500), "noise"))
      step()
    }
    val byId = out.map(r => r.getAs[String]("slaveId") -> r).toMap
    assert(byId("s0").getAs[Timestamp]("cv_ts") === t(20))
    assert(byId("s0").getAs[String]("status") === "click")
    assert(byId("s1").getAs[Timestamp]("cv_ts") === null) // emitted, null-padded
    assert(byId("s1").getAs[String]("status") === null)
    // the matched row arrived in-window; the unmatched row is the
    // absence-of-event fact the inner S8 join can never produce
    assert(out.count(_.getAs[String]("slaveId") == "s1") === 1)
  }

  test("S29 full-outer stream join emits BOTH unmatched sides after the watermark") {
    val sends = MemoryStream[Tick]
    val acks = MemoryStream[(String, Timestamp, String)]
    val ackDf = acks.toDF().toDF("slaveId", "ack_ts", "status")
    val out = runQuery(Streams.streamStreamFullJoin(sends.toDF(), ackDf),
      OutputMode.Append, "s29") { step =>
      sends.addData(Tick("s0", t(10), 1.0, "{}"),  // acked at t(20)
        Tick("s1", t(12), 2.0, "{}"))              // LOST: never acked
      acks.addData(("s0", t(20), "ok"),
        ("s2", t(15), "phantom"))                  // PHANTOM: never sent
      step()
      // advance event time on BOTH inputs past band + lateness so both
      // absence facts become provable and the buffered rows evict
      sends.addData(Tick("s9", t(500), 0.0, "{}"))
      acks.addData(("s9", t(500), "noise"))
      step()
    }
    val byKey = out.filter(r => Set("s0", "s1", "s2")(r.getAs[String]("key")))
      .map(r => r.getAs[String]("key") -> r).toMap
    assert(byKey.keySet === Set("s0", "s1", "s2"))
    // matched pair: both sides present
    assert(byKey("s0").getAs[Timestamp]("snd_ts") === t(10))
    assert(byKey("s0").getAs[Timestamp]("ack_ts") === t(20))
    assert(byKey("s0").getAs[String]("status") === "ok")
    // lost message: send side only, ack side null-padded
    assert(byKey("s1").getAs[Timestamp]("snd_ts") === t(12))
    assert(byKey("s1").getAs[Timestamp]("ack_ts") === null)
    assert(byKey("s1").getAs[String]("status") === null)
    // phantom ack: ack side only, send side null-padded — the emission
    // mode neither S8 nor S17 can produce
    assert(byKey("s2").getAs[Timestamp]("snd_ts") === null)
    assert(byKey("s2").getAs[String]("status") === "phantom")
    // exactly one row per key — unmatched facts emit once at eviction
    Seq("s0", "s1", "s2").foreach { k =>
      assert(out.count(_.getAs[String]("key") == k) === 1)
    }
  }

  test("A1 replay source streams a captured parquet dir through the pipeline") {
    val capture = java.nio.file.Files.createTempDirectory("replay_src").toString
    val events = Tables.events(spark, sf).limit(20)
    events.write.mode("overwrite").parquet(capture)
    val schema = spark.read.parquet(capture).schema
    val replay = Streams.replayEvents(spark, capture, schema)
    assert(replay.isStreaming)
    val q = replay.writeStream.format("memory").queryName("replay_out")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("replay_out")
    assert(out.count() === 20)
    assert(out.columns.toSeq === Seq("slaveId", "ts", "value", "props"))
    assert(out.filter(org.apache.spark.sql.functions.col("slaveId")
      .startsWith("slave-")).count() === 20)
  }

  test("A1 rate→tick projection yields the envelope source schema") {
    val raw = Seq((new Timestamp(1000L), 7L)).toDF("timestamp", "value")
    val ticks = Streams.rateToTicks(raw, 4).collect()
    assert(ticks.length === 1)
    val r = ticks.head
    assert(r.getAs[String]("slaveId") === "slave-3")
    assert(r.getAs[Double]("value") === 7.0)
    assert(r.getAs[String]("props") === """{"seq": 7}""")
  }

  test("S7 sink recovers from checkpoint after restart without duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("s7_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s7_ckpt").toString
    val in = MemoryStream[Tick]
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.envelopeSinkBatch(dir, "none") _)
      .start()
    val q1 = start()
    try { in.addData(Tick("s0", t(1), 1.0, "{}")); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the same checkpoint: committed offsets are not replayed
    val q2 = start()
    try { in.addData(Tick("s1", t(2), 2.0, "{}")); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/batch=*")
      .selectExpr("cast(key as string) k")
    assert(rows.count() === 2) // no duplicate emission of the first batch
    assert(rows.as[String].collect().toSet === Set("s0", "s1"))
  }

  test("S12 live poll loop: ticks -> REAL HTTP fetch -> envelope -> keyed sink") {
    import graft.sources.SnapshotTarget
    // A genuine loopback HTTP server plays the slave; the pipeline's
    // DEFAULT fetcher does a real GET per distinct due slave per batch.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/metrics/snapshot",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = """{"slave/cpus_total": 4}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      })
    server.start()
    val port = server.getAddress.getPort
    val dir = java.nio.file.Files.createTempDirectory("s12_sink").toString
    try {
      val in = MemoryStream[Tick]
      val q = in.toDF().writeStream
        .foreachBatch(Streams.pollEnvelopeSinkBatch(dir,
          // slave-1 points at a dead port: its tick must still ship with
          // the empty payload instead of stalling the stream
          s => SnapshotTarget(s, "127.0.0.1",
            if (s == "slave-1") 1 else port)) _)
        .start()
      try {
        in.addData(
          Tick("slave-0", t(1), 1.0, "ignored"),
          Tick("slave-0", t(2), 2.0, "ignored"),
          Tick("slave-1", t(2), 3.0, "ignored"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.parquet(s"$dir/batch=*")
        .selectExpr("cast(key as string) k", "cast(value as string) v")
        .collect()
      assert(rows.length === 3) // one envelope per tick, not per slave
      val bySlave = rows.groupBy(_.getString(0))
      // live slave: the REAL fetched metrics are in the envelope
      for (r <- bySlave("slave-0")) {
        assert(r.getString(1).contains(""""Metrics":{"slave/cpus_total":4}"""),
          r.getString(1))
        assert(r.getString(1).contains(""""Hostname":"127.0.0.1""""))
      }
      // dead slave: tick kept, metrics empty (the scan's error posture)
      for (r <- bySlave("slave-1"))
        assert(r.getString(1).contains(""""Metrics":{}"""), r.getString(1))
    } finally server.stop(0)
  }

  test("S12 poll loop recovers from checkpoint without refetching committed batches") {
    import graft.sources.SnapshotTarget
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/metrics/snapshot",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        hits.incrementAndGet()
        val body = """{"m": 1}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      })
    server.start()
    val port = server.getAddress.getPort
    val dir = java.nio.file.Files.createTempDirectory("s12_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s12_ckpt").toString
    try {
      val in = MemoryStream[Tick]
      def start() = in.toDF().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(Streams.pollEnvelopeSinkBatch(dir,
          s => SnapshotTarget(s, "127.0.0.1", port), transform = "avro") _)
        .start()
      val q1 = start()
      try { in.addData(Tick("slave-0", t(1), 1.0, "x")); q1.processAllAvailable() }
      finally q1.stop()
      val fetchesAfterFirst = hits.get()
      assert(fetchesAfterFirst >= 1)
      val q2 = start()
      try { in.addData(Tick("slave-1", t(2), 2.0, "x")); q2.processAllAvailable() }
      finally q2.stop()
      // committed batch not replayed: its rows exist once AND its slave was
      // not re-polled on restart (no duplicate side effects, not just no
      // duplicate rows)
      val keys = spark.read.parquet(s"$dir/batch=*")
        .selectExpr("cast(key as string) k").as[String].collect().toSeq
      assert(keys.sorted === Seq("slave-0", "slave-1"))
      assert(hits.get() === fetchesAfterFirst + 1, s"refetched: ${hits.get()}")
      // registry id stability across the restart: every Confluent frame
      // written BEFORE and AFTER the restart carries the same big-endian
      // schema id, and a fresh re-registration in this session reproduces
      // it — at-least-once delivery silently depends on this (an id that
      // drifted across restarts would make replayed frames differ from
      // their committed originals).
      val frameIds = spark.read.parquet(s"$dir/batch=*")
        .select("value").as[Array[Byte]].collect()
        .map(v => ((v(1) & 0xff) << 24) | ((v(2) & 0xff) << 16) |
          ((v(3) & 0xff) << 8) | (v(4) & 0xff)).toSet
      assert(frameIds === Set(graft.operators.EnvelopeSink.schemaId),
        frameIds.toString)
    } finally server.stop(0)
  }

  test("S15 streaming near-dedup: batches check the growing store; restart replays cleanly") {
    val store = java.nio.file.Files.createTempDirectory("s15_store").toString
    val out = java.nio.file.Files.createTempDirectory("s15_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s15_ckpt").toString
    val in = MemoryStream[DocSourced]
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.nearDedupSinkBatch(store, out, 0.5) _)
      .start()
    val q1 = start()
    try {
      in.addData(DocSourced(1L, t(1),
        "the quick brown fox jumps over the lazy dog", "a"))
      q1.processAllAvailable()
      // batch 1 sees batch 0's signatures: doc 2 is a near-dup of doc 1,
      // doc 3 is novel
      in.addData(
        DocSourced(2L, t(2),
          "the quick brown fox jumps over the lazy cat", "a"),
        DocSourced(3L, t(2),
          "completely different novel content about engines", "a"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: the store must serve the SAME at-rest
    // signatures — an exact dup of doc 1 lands on it across the restart
    val q2 = start()
    try {
      in.addData(DocSourced(4L, t(3),
        "the quick brown fox jumps over the lazy dog", "a"))
      q2.processAllAvailable()
    } finally q2.stop()
    val d = spark.read.parquet(s"$out/batch=*")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_novel"), Option(r.getAs[Any]("near_store_id"))))
      .toMap
    assert(d.keySet === Set(1L, 2L, 3L, 4L))
    assert(d(1L)._1 && d(3L)._1) // novel
    assert(!d(2L)._1 && d(2L)._2 === Some(1L))
    assert(!d(4L)._1 && d(4L)._2 === Some(1L)) // store survived the restart
    // one delta per batch — replay rewrote, never duplicated
    val deltas = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("delta=")).map(_.getName).sorted
    assert(deltas.toSeq === Seq("delta=0", "delta=1", "delta=2"))
    // store-format unity: the streaming deltas ARE the batch signature
    // store's schema, field for field — the batch incremental-near path
    // (oracle-checked via q_dedup_incr_near) can read this store directly
    // (nullability normalized — a parquet round-trip relaxes it)
    val streamedSchema = spark.read.parquet(s"$store/delta=0").schema
    val batchSchema = graft.operators.Dedup.signatureStore(
      Tables.documents(spark, sf).limit(0), "text", "doc_id").schema
    def norm(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f =>
        (f.name, f.dataType.simpleString)).toSeq // type text drops nullability
    assert(norm(streamedSchema) === norm(batchSchema))
  }

  test("S22 streaming ANN ingest: stored-quantizer deltas, replay rewrites, probe serves the union") {
    import graft.operators.Similarity
    val layout = java.nio.file.Files.createTempDirectory("s22_layout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s22_ckpt").toString
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding")
    Similarity.writeIvfPqLayout(base, layout, nCells = 4)
    val oddRows = odd.collect()
      .map(r => VecIngest(r.getLong(0), r.getSeq[Float](1)))
    val (wave1, wave2) = oddRows.splitAt(oddRows.length / 2)
    val in = MemoryStream[VecIngest]
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.annIngestSinkBatch(layout) _)
      .start()
    val q1 = start()
    try { in.addData(wave1.toSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the checkpoint: the second wave lands as its own delta
    val q2 = start()
    try { in.addData(wave2.toSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    // replay idempotence: re-running a batch id rewrites its delta
    // in place — total stored code rows unchanged
    val deltaRows = () =>
      spark.read.parquet(s"$layout/codes_deltas").count()
    val before = deltaRows()
    assert(before === oddRows.length.toLong)
    Streams.annIngestSinkBatch(layout)(
      wave1.toSeq.toDF("vec_id", "embedding"), 0L)
    assert(deltaRows() === before)
    // streamed codes are BIT-IDENTICAL to the batch stored-quantizer
    // encode of the same vectors (one contract, two ingest paths)
    val streamed = spark.read.parquet(s"$layout/codes_deltas")
      .select("vec_id", "cell_id", "codes")
      .collect().map(_.toString).sorted.toSeq
    val batchEnc = Similarity.encodeForIvfPqLayout(odd, layout)
      .select("vec_id", "cell_id", "codes")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batchEnc)
    // and the probe serves base + deltas: under full probe + wide
    // shortlist the answer equals brute force over the whole union
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val got = Similarity.probeIvfPqLayoutAll(layout, queries,
        emb.select("vec_id", "embedding"), k = 10, nProbe = 4,
        shortlistFactor = 1000)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val exact = Similarity.cosineTopK(queries,
        emb.select("vec_id", "embedding"), 10)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(got === exact)
  }

  test("S23 streaming KMV: fixed-size state, batch-equal estimates, restart persistence") {
    import graft.streaming.{KmvEstimate, UserSeen}
    // transformWithState needs the RocksDB store; scoped + restored
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val ckpt = java.nio.file.Files.createTempDirectory("s23_ckpt").toString
    val k = 8
    val in = MemoryStream[UserSeen]
    val sink = new scala.collection.mutable.ArrayBuffer[KmvEstimate]
    def start() = Streams.kmvDistinct(in.toDS(), k).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[KmvEstimate], _: Long) =>
        sink.synchronized { sink ++= b.collect() }; ()
      }
      .start()
    // transformWithState queries never settle under processAllAvailable
    // (processing-time mode keeps scheduling batches) — poll the sink
    // with a deadline instead, the S16 pattern
    def await(n: Int): Unit = {
      val deadline = System.nanoTime() + 120e9.toLong
      while (sink.synchronized(sink.length) < n &&
        System.nanoTime() < deadline) Thread.sleep(100L)
      assert(sink.synchronized(sink.length) >= n,
        s"sink never reached $n rows")
    }
    val usersA = (1L to 40L)
    val usersB = (100L to 105L) // below k -> estimate stays null
    val q1 = start()
    try {
      in.addData(usersA.take(20).map(u => UserSeen("a", t(1), u)): _*)
      await(1)
    } finally stopAtCommitBoundary(q1, ckpt)
    // restart: the k-min set must survive the checkpoint
    val q2 = start()
    try {
      in.addData((usersA.drop(20).map(u => UserSeen("a", t(2), u)) ++
        usersB.map(u => UserSeen("b", t(2), u))): _*)
      await(3)
    } finally q2.stop()
    val last = sink.synchronized {
      sink.groupBy(_.event_type).map { case (g, rows) => g -> rows.last }
    }
    assert(last("b").n_est.isEmpty && last("b").n_hashes === usersB.size.toLong)
    assert(last("a").n_hashes === k.toLong)
    // the estimate must equal the batch-side md5 family EXACTLY: recompute
    // h_k with Spark SQL's md5/conv (the q_kmv_distinct recipe), not by
    // calling the processor's own hash
    val hk = usersA.toDF("user_id")
      .select(conv(substring(md5(col("user_id").cast("string")), 1, 12),
        16, 10).cast("long").as("h"))
      .orderBy("h").limit(k).collect().map(_.getLong(0)).last
    assert(last("a").n_est === Some((k - 1).toLong * (1L << 48) / hk))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("S24 probe under concurrent append sees only committed deltas (snapshot isolation)") {
    import graft.operators.Similarity
    val layout = java.nio.file.Files.createTempDirectory("s24_layout").toString
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding").collect()
    val (wave1, wave2) = odd.splitAt(odd.length / 2)
    def df(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => VecIngest(r.getLong(0), r.getSeq[Float](1)))
        .toSeq.toDF("vec_id", "embedding")
    Similarity.writeIvfPqLayout(base, layout, nCells = 4)
    Streams.annIngestSinkBatch(layout)(df(wave1), 0L) // committed delta=0
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.select("vec_id", "embedding")
    def probe(): Set[(Long, Long)] =
      Similarity.probeIvfPqLayoutAll(layout, queries, corpus,
          k = 10, nProbe = 4, shortlistFactor = 1000)
        .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val committed = probe()
    // Simulate wave2 IN FLIGHT: an output committer stages files under
    // delta=1/_temporary until commit — the reader's listing must ignore
    // them, so a concurrent probe serves exactly the pre-append union.
    val inflight = new java.io.File(s"$layout/codes_deltas/delta=1/_temporary/0")
    assert(inflight.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(inflight.toString, "part-000-attempt.parquet"),
      Array[Byte](0x50, 0x41, 0x52)) // a truncated, uncommitted file
    assert(probe() === committed,
      "a probe mid-append must equal the pre-append committed union")
    // The commit lands (overwrite of delta=1 — the replay-rewrite path
    // also clears the staged files): the probe now serves everything,
    // equal to brute force over the whole corpus.
    Streams.annIngestSinkBatch(layout)(df(wave2), 1L)
    val after = probe()
    val exact = Similarity.cosineTopK(queries, corpus, 10)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(after === exact)
    // Degenerate sibling: a layout whose ONLY delta is in-flight (or an
    // empty deltas dir after full compaction) serves the base alone
    // instead of failing schema inference.
    val layout2 = java.nio.file.Files.createTempDirectory("s24_l2").toString
    Similarity.writeIvfPqLayout(base, layout2, nCells = 4)
    val stage2 = new java.io.File(s"$layout2/codes_deltas/delta=0/_temporary/0")
    assert(stage2.mkdirs())
    val baseOnly = Similarity.probeIvfPqLayoutAll(layout2, queries, corpus,
        k = 10, nProbe = 4, shortlistFactor = 1000)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val exactBase = Similarity.cosineTopK(queries, base, 10)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(baseOnly === exactBase)
    // Schema DRIFT in a committed delta is a real failure, not an
    // in-flight condition: the probe must fail loudly instead of silently
    // dropping committed vectors from the serving index (the round-10
    // blanket AnalysisException catch swallowed exactly this).
    Seq((1L, "drifted")).toDF("vec_id", "not_codes")
      .write.mode("overwrite").parquet(s"$layout2/codes_deltas/delta=7")
    intercept[org.apache.spark.sql.AnalysisException] {
      Similarity.probeIvfPqLayoutAll(layout2, queries, corpus,
        k = 10, nProbe = 4, shortlistFactor = 1000).collect()
    }
  }

  test("S27 exemplar sample: k-min content set equals the batch stratified pick across restarts") {
    import graft.streaming.{DocSourced => DS, ExemplarRow}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s27_ckpt").toString
      val k = 3
      val docsA = (1L to 8L).map(i => DS(i, t(i), s"alpha text $i", "sa"))
      val docsB = (101L to 104L).map(i => DS(i, t(i), s"beta text $i", "sb"))
      val in = MemoryStream[DS]
      val sink = new scala.collection.mutable.ArrayBuffer[ExemplarRow]
      def start() = Streams.exemplarSample(in.toDS(), k).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[ExemplarRow],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (sink.synchronized(sink.length) < n &&
          System.nanoTime() < deadline) Thread.sleep(100L)
        assert(sink.synchronized(sink.length) >= n,
          s"sink never reached $n rows")
      }
      // batch truth FIRST: the k smallest md5(text) per source over ALL
      // docs, recomputed with Spark SQL's md5 (not the processor's hash)
      import org.apache.spark.sql.expressions.Window
      val all = (docsA ++ docsB).map(d => (d.doc_id, d.text, d.source))
        .toDF("doc_id", "text", "source")
      val w = Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
      val expect: Map[String, Set[Long]] = all
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("source", "doc_id").as[(String, Long)].collect().toSeq
        .groupBy(_._1).map { case (s0, r) => s0 -> r.map(_._2).toSet }
      def lastSnapshot(): Map[String, Set[Long]] = sink.synchronized {
        sink.groupBy(_.source).map { case (s0, rows) =>
          val sz = rows.last.sample_size
          s0 -> rows.reverse.take(sz.toInt).map(_.doc_id).toSet
        }
      }
      // a restart may replay the last batch before new data runs, so
      // await the CONDITION (final snapshot = batch truth), not a count
      def awaitSnapshot(want: Map[String, Set[Long]]): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (lastSnapshot() != want && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(lastSnapshot() === want)
      }
      val q1 = start()
      try { in.addData(docsA.take(4) ++ docsB.take(2): _*); await(5) }
      finally stopAtCommitBoundary(q1, ckpt)
      // restart: the retained list must survive the checkpoint; the
      // second wave can only evict by having a SMALLER content hash
      val q2 = start()
      try {
        in.addData(docsA.drop(4) ++ docsB.drop(2): _*)
        awaitSnapshot(expect)
      } finally q2.stop()
      // bounded state: never more than k exemplars per source
      assert(sink.synchronized(sink.map(_.sample_size).max) <= k.toLong)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("S28 source-mix monitor: running per-lang counts + entropy, MapState survives restart") {
    import graft.streaming.{DocLang, MixSnapshot}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s28_ckpt").toString
      val in = MemoryStream[DocLang]
      val sink = new scala.collection.mutable.ArrayBuffer[MixSnapshot]
      def start() = Streams.sourceMixMonitor(in.toDS()).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[MixSnapshot],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      def awaitMix(source: String, want: String): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        def last() = sink.synchronized(
          sink.filter(_.source == source).lastOption.map(_.mix))
        while (!last().contains(want) && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(last() === Some(want))
      }
      // wave 1: 3 en + 1 de for src0
      val q1 = start()
      try {
        in.addData(
          DocLang(1L, t(1), "en", "src0"), DocLang(2L, t(2), "en", "src0"),
          DocLang(3L, t(3), "en", "src0"), DocLang(4L, t(4), "de", "src0"))
        awaitMix("src0", "de:1,en:3")
      } finally stopAtCommitBoundary(q1, ckpt)
      // restart: the map must restore; wave 2 shifts the mix
      val q2 = start()
      try {
        in.addData(
          DocLang(5L, t(5), "fr", "src0"), DocLang(6L, t(6), "de", "src0"))
        awaitMix("src0", "de:2,en:3,fr:1")
      } finally q2.stop()
      val snap = sink.synchronized(sink.filter(_.source == "src0").last)
      assert(snap.n_langs === 3L && snap.total === 6L)
      // entropy of (2/6, 3/6, 1/6), milli-nats, same rounding
      val expected = math.round(Seq(2.0, 3.0, 1.0).map { c =>
        val p = c / 6.0; -p * math.log(p)
      }.sum * 1000.0)
      assert(snap.entropy_milli === expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("S38 novelty monitor: per-batch novel 3-gram types, seen-set survives restart, replays exact") {
    import graft.streaming.NoveltyRow
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s38_ckpt").toString
      val in = MemoryStream[DocSourced]
      val sink = new scala.collection.mutable.ArrayBuffer[NoveltyRow]
      def start() = Streams.noveltyMonitor(in.toDS(), n = 3).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[NoveltyRow],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      // predicate wait, the S28 awaitMix posture: a restart may REPLAY
      // the last uncommitted batch (foreachBatch is at-least-once), and
      // a replayed emission is a legitimate duplicate computed against
      // the rolled-back state — so waits key on the EXPECTED row, never
      // on sink growth
      def awaitRow(what: String)(want: NoveltyRow => Boolean): NoveltyRow = {
        val deadline = System.nanoTime() + 120e9.toLong
        def found() = sink.synchronized(sink.find(want))
        while (found().isEmpty && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(found().nonEmpty,
          s"$what: no matching row in ${sink.synchronized(sink.toList)}")
        found().get
      }
      // wave 1: "a b c d" has 3-grams {a b c, b c d}; "a b c" has {a b c}
      // (duplicate type within the batch counts ONCE); "x y" is too short
      val q1 = start()
      val r1 =
        try {
          in.addData(
            DocSourced(1L, t(1), "a b c d", "src0"),
            DocSourced(2L, t(2), "a b c", "src0"),
            DocSourced(3L, t(3), "x y", "src0"))
          awaitRow("wave1")(r => r.batch_types == 2L && r.novel_types == 2L)
        } finally stopAtCommitBoundary(q1, ckpt)
      assert(r1.source === "src0")
      assert(r1.batch_grams === 3L)   // 2 + 1 + 0 occurrences
      assert(r1.novelty_permille === 1000L)
      assert(r1.seen_types === 2L)
      // restart: the seen-set must restore — wave 2 repeats one known
      // type and brings one new one
      val q2 = start()
      val r2 =
        try {
          in.addData(DocSourced(4L, t(4), "b c d e", "src0"))
          // {b c d, c d e}: exactly one novel iff the store restored
          awaitRow("wave2")(r => r.batch_types == 2L && r.novel_types == 1L)
        } finally stopAtCommitBoundary(q2, ckpt)
      assert(r2.novelty_permille === 500L)
      assert(r2.seen_types === 3L)
      // novelty collapse: an all-seen batch reads zero — the crawl-loop
      // alarm shape
      val q3 = start()
      val r3 =
        try {
          in.addData(DocSourced(5L, t(5), "a b c d e", "src0"))
          awaitRow("wave3")(r => r.batch_types == 3L && r.novel_types == 0L)
        } finally q3.stop()
      assert(r3.novelty_permille === 0L && r3.seen_types === 3L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("S39 dimension enrichment: facts read the dim version current at " +
      "their position; state survives restart; no retro-correction") {
    import graft.streaming.{DimOrFact, EnrichedFact}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s39_ckpt").toString
      val in = MemoryStream[DimOrFact]
      val sink = new scala.collection.mutable.ArrayBuffer[EnrichedFact]
      def start() = Streams.dimensionEnrich(in.toDS()).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EnrichedFact],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      def awaitFact(what: String)(want: EnrichedFact => Boolean): EnrichedFact = {
        val deadline = System.nanoTime() + 120e9.toLong
        def found() = sink.synchronized(sink.find(want))
        while (found().isEmpty && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(found().nonEmpty,
          s"$what: no matching row in ${sink.synchronized(sink.toList)}")
        found().get
      }
      // wave 1, ONE batch: a fact BEFORE the dim lands unknown/v0, the
      // dim update applies at its ts, a later fact reads attr A / v1,
      // a fact on a dim-less key is unknown/v0, and a fact TIED with a
      // second update enriches against the PRE-update value (facts
      // before dims on ts ties — the pinned tie-break)
      val q1 = start()
      try {
        in.addData(
          DimOrFact("k1", t(1), isDim = false, "", 10.0),
          DimOrFact("k1", t(2), isDim = true, "A", 0.0),
          DimOrFact("k1", t(3), isDim = false, "", 11.0),
          DimOrFact("k2", t(3), isDim = false, "", 99.0),
          DimOrFact("k1", t(4), isDim = true, "B", 0.0),
          DimOrFact("k1", t(4), isDim = false, "", 12.0))
        awaitFact("wave1")(f => f.value == 12.0)
      } finally stopAtCommitBoundary(q1, ckpt)
      def fact(v: Double) = sink.synchronized(sink.find(_.value == v)).get
      assert(fact(10.0).attr === "__unknown__" && fact(10.0).dim_version === 0L)
      assert(fact(11.0).attr === "A" && fact(11.0).dim_version === 1L)
      assert(fact(99.0).attr === "__unknown__" && fact(99.0).dim_version === 0L)
      assert(fact(12.0).attr === "A" && fact(12.0).dim_version === 1L,
        "ts-tied fact must see the PRE-update dimension")
      // restart: the dim state (now B, v2) must restore; k1 facts read
      // it, and k2's earlier unknown fact is NOT retro-corrected
      val q2 = start()
      try {
        in.addData(DimOrFact("k1", t(5), isDim = false, "", 13.0))
        awaitFact("wave2")(f => f.value == 13.0 && f.attr == "B" &&
          f.dim_version == 2L)
      } finally q2.stop()
      // no retro-correction: every emission of k2's fact — including a
      // replay of the uncommitted last batch (foreachBatch is
      // at-least-once; the replay recomputes against rolled-back state,
      // so it is bit-identical) — still reads unknown/v0
      val k2facts = sink.synchronized(sink.filter(_.value == 99.0).toList)
      assert(k2facts.nonEmpty && k2facts.forall(f =>
        f.attr == "__unknown__" && f.dim_version == 0L), k2facts.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("S26 streaming decontamination flags exactly the batch operator's ids across restarts") {
    import graft.operators.Decontaminate
    val gate = java.nio.file.Files.createTempDirectory("s26_gate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s26_ckpt").toString
    val n = 3
    // the benchmark: two eval docs whose 3-gram shingles define contamination
    val eval = Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val bloom = Streams.buildDecontaminationGate(eval, "text", n, gate)
    // stream: 1 and 4 contain a full eval 3-gram run; 2 and 3 are clean
    val wave1 = Seq(
      DocIngest(1L, t(1), "note the quick brown fox appeared here"),
      DocIngest(2L, t(2), "completely unrelated clean text body"))
    val wave2 = Seq(
      DocIngest(3L, t(3), "another clean document entirely fresh words"),
      DocIngest(4L, t(4), "shipment pack my box with care today"))
    val in = MemoryStream[DocIngest]
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.decontaminateSinkBatch(gate, bloom, n) _)
      .start()
    val q1 = start()
    try { in.addData(wave1: _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start() // restart: second wave lands as its own delta
    try { in.addData(wave2: _*); q2.processAllAvailable() }
    finally q2.stop()
    def flaggedIds() = spark.read.parquet(s"$gate/contaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(flaggedIds() === Set(1L, 4L))
    // one contract, two paths: equals the batch operator over the union
    val union = (wave1 ++ wave2).map(d => (d.doc_id, d.text))
      .toDF("doc_id", "text")
    val batchIds = Decontaminate.contaminatedIds(union, eval, "text",
        "doc_id", n)
      .as[Long].collect().toSet
    assert(flaggedIds() === batchIds)
    // replay idempotence: re-running batch 0 rewrites its delta in place
    Streams.decontaminateSinkBatch(gate, bloom, n)(
      wave1.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), 0L)
    assert(flaggedIds() === Set(1L, 4L))
  }

  test("S26 chaos: gate REBUILT after a kill — resumed query still equals the batch twin") {
    import graft.operators.Decontaminate
    // A driver kill loses the in-memory Bloom literal; on restart the
    // registration step re-runs buildDecontaminationGate against the
    // at-rest shingle store. The rebuild must be bit-deterministic
    // (Bloom insertion is an order-independent OR of bit sets) so the
    // resumed query's gate decisions — and therefore the flag set — are
    // identical to an unkilled run's.
    val gate = java.nio.file.Files.createTempDirectory("s26c_gate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s26c_ckpt").toString
    val n = 3
    val eval = Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val bloom1 = Streams.buildDecontaminationGate(eval, "text", n, gate)
    val wave1 = Seq(
      DocIngest(1L, t(1), "note the quick brown fox appeared here"),
      DocIngest(2L, t(2), "completely unrelated clean text body"))
    val wave2 = Seq(
      DocIngest(3L, t(3), "another clean document entirely fresh words"),
      DocIngest(4L, t(4), "shipment pack my box with care today"))
    val in = MemoryStream[DocIngest]
    def start(bloom: Array[Byte]) = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.decontaminateSinkBatch(gate, bloom, n) _)
      .start()
    val q1 = start(bloom1)
    try { in.addData(wave1: _*); q1.processAllAvailable() }
    finally q1.stop() // KILL: the driver-held bloom literal is gone
    val bloom2 = Streams.buildDecontaminationGate(eval, "text", n, gate)
    assert(java.util.Arrays.equals(bloom1, bloom2),
      "gate rebuild must be bit-deterministic")
    val q2 = start(bloom2)
    try { in.addData(wave2: _*); q2.processAllAvailable() }
    finally q2.stop()
    val flagged = spark.read.parquet(s"$gate/contaminated")
      .select("doc_id").as[Long].collect().toSet
    val union = (wave1 ++ wave2).map(d => (d.doc_id, d.text))
      .toDF("doc_id", "text")
    assert(flagged === Decontaminate.contaminatedIds(union, eval, "text",
      "doc_id", n).as[Long].collect().toSet)
  }

  test("S27 chaos: ListState kill-and-resume (changelog) — recovered list still evicts correctly") {
    import graft.streaming.{DocSourced => DS, ExemplarRow}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = Seq(provider, changelog).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelog, "true")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s27c_ckpt").toString
      val k = 2
      // enough docs that the pre-kill list is FULL and has already evicted
      // once — recovery must restore the exact retained set, because the
      // post-kill eviction decision (keep/drop by content hash) is only
      // correct against the recovered list, not an empty one
      val wave1 = (1L to 4L).map(i => DS(i, t(i), s"doc text $i", "s"))
      val wave2 = (5L to 8L).map(i => DS(i, t(i), s"doc text $i", "s"))
      val in = MemoryStream[DS]
      val sink = new scala.collection.mutable.ArrayBuffer[ExemplarRow]
      def start() = Streams.exemplarSample(in.toDS(), k).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[ExemplarRow],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      import org.apache.spark.sql.expressions.Window
      val all = (wave1 ++ wave2).map(d => (d.doc_id, d.text, d.source))
        .toDF("doc_id", "text", "source")
      val w = Window.partitionBy("source")
        .orderBy(md5(col("text")), col("doc_id"))
      val expect = all.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("doc_id").as[Long].collect().toSet
      def lastSnapshot(): Set[Long] = sink.synchronized {
        val rows = sink.filter(_.source == "s")
        rows.lastOption.map(r => rows.reverse.take(r.sample_size.toInt)
          .map(_.doc_id).toSet).getOrElse(Set.empty)
      }
      val q1 = start()
      try {
        in.addData(wave1: _*)
        val deadline = System.nanoTime() + 120e9.toLong
        while (sink.synchronized(sink.length) < 1 &&
          System.nanoTime() < deadline) Thread.sleep(100L)
      } finally stopAtCommitBoundary(q1, ckpt) // full, already-evicted list in state
      val q2 = start()
      try {
        in.addData(wave2: _*)
        val deadline = System.nanoTime() + 120e9.toLong
        while (lastSnapshot() != expect && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(lastSnapshot() === expect,
          "recovered ListState must yield the batch k-min over the union")
      } finally q2.stop()
      assert(sink.synchronized(sink.map(_.sample_size).max) <= k.toLong)
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  test("S28 chaos: MapState kill-and-resume (changelog) — counts stay exact, nothing doubled") {
    import graft.streaming.{DocLang, MixSnapshot}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = Seq(provider, changelog).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelog, "true")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s28c_ckpt").toString
      val in = MemoryStream[DocLang]
      val sink = new scala.collection.mutable.ArrayBuffer[MixSnapshot]
      def start() = Streams.sourceMixMonitor(in.toDS()).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[MixSnapshot],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      def awaitMix(want: String): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        def last() = sink.synchronized(
          sink.filter(_.source == "src0").lastOption.map(_.mix))
        while (!last().contains(want) && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(last() === Some(want))
      }
      val q1 = start()
      try {
        in.addData(
          DocLang(1L, t(1), "en", "src0"), DocLang(2L, t(2), "de", "src0"))
        awaitMix("de:1,en:1")
      } finally stopAtCommitBoundary(q1, ckpt) // two live map entries
      // resume under changelog recovery: increments must land on the
      // RECOVERED counters exactly once — a lost map reads de:1, a
      // doubled replay reads en:3
      val q2 = start()
      try {
        in.addData(
          DocLang(3L, t(3), "en", "src0"), DocLang(4L, t(4), "de", "src0"))
        awaitMix("de:2,en:2")
      } finally q2.stop()
      val snap = sink.synchronized(sink.filter(_.source == "src0").last)
      assert(snap.total === 4L && snap.n_langs === 2L)
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  test("S10 quality monitor alerts on the degraded source, not the healthy one") {
    val in = MemoryStream[DocSourced]
    val out = runQuery(
      Streams.qualityMonitor(in.toDF(), "10 seconds", "10 seconds"),
      OutputMode.Append, "s10") { step =>
      // "good": stopwords + distinct tokens -> score ~0.60; "junk": one
      // repeated single-char token -> score ~0.09 (alert threshold 0.45)
      in.addData(
        DocSourced(1L, t(1), "the cat sat on a mat", "good"),
        DocSourced(2L, t(2), "x x x x x x", "junk"),
        DocSourced(3L, t(4), "the dog ran to a tree", "good"))
      step()
      in.addData(DocSourced(9L, t(60), "filler", "good")) // close [0,10)
    }
    val closed = out.filter(_.getAs[Timestamp]("w_start") === t(0))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Boolean]("alert"))).toMap
    assert(closed === Map("good" -> ((2L, false)), "junk" -> ((1L, true))))
  }

  test("S25 PSI monitor alerts on the shifted source, matches batch smoothing on the faithful one") {
    import graft.streaming.ValSeen
    // reference distribution: values 1..16 (one bucket, bucket_hi=16) and
    // 17..32 (bucket_hi=32), 50/50 — the at-rest profile a batch run wrote
    val reference = Seq((16L, 50L), (32L, 50L)).toDF("bucket_hi", "r")
    val in = MemoryStream[ValSeen]
    val out = runQuery(
      Streams.psiMonitor(in.toDS(), reference, "10 seconds", "10 seconds"),
      OutputMode.Append, "s25") { step =>
      // "faithful" mirrors the reference 50/50; "shifted" puts everything
      // in one bucket plus a value the reference never saw (bucket 64)
      val faithful = (1 to 10).map(i =>
        ValSeen("faithful", t(i % 9), if (i % 2 == 0) 10L else 20L))
      val shifted = (1 to 10).map(i =>
        ValSeen("shifted", t(i % 9), if (i == 1) 40L else 10L))
      in.addData(faithful ++ shifted: _*)
      step()
      in.addData(ValSeen("faithful", t(60), 10L)) // close [0,10)
    }
    val closed = out.filter(_.getAs[Timestamp]("w_start") === t(0))
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("psi_micro"), r.getAs[Boolean]("alert"))).toMap
    assert(closed.keySet === Set("faithful", "shifted"))
    assert(!closed("faithful")._2,
      s"faithful source must not alert: ${closed("faithful")}")
    assert(closed("shifted")._2,
      s"shifted source must alert: ${closed("shifted")}")
    // the smoothing is the batch twin's: recompute faithful's PSI by hand
    // (k=2, n_all=100, n_g=10, c=(5,5)) and require the exact micro value
    val p = (5.0 + 1.0) / (10.0 + 2)
    val q = (50.0 + 1.0) / (100.0 + 2)
    val term = math.round((p - q) * math.log(p / q) * 1e12)
    val expect = math.round(2 * term / 1e6)
    assert(closed("faithful")._1 === expect,
      s"faithful psi ${closed("faithful")._1} != hand-computed $expect")
  }

  test("S11 trending tokens: the MG sketch surfaces the hot token per closed window") {
    val in = MemoryStream[DocSourced]
    val out = runQuery(
      Streams.trendingTokens(in.toDF(), "10 seconds", "10 seconds",
        capacity = 3),
      OutputMode.Append, "s11") { step =>
      // "hot" dominates the window (>1/4 of tokens -> guaranteed candidate)
      in.addData(
        DocSourced(1L, t(1), "hot hot hot hot cold warm", "a"),
        DocSourced(2L, t(3), "hot hot mild damp", "a"))
      step()
      in.addData(DocSourced(9L, t(60), "later", "a")) // close [0,10)
    }
    val closed = out.filter(_.getAs[Timestamp]("w_start") === t(0))
    assert(closed.length === 1)
    assert(closed.head.getAs[Long]("n_tokens") === 10L)
    assert(closed.head.getSeq[String](2).contains("hot"))
  }

  test("S7 foreachBatch envelope sink commits per-batch parquet") {
    val dir = java.nio.file.Files.createTempDirectory("s7_sink").toString
    val in = MemoryStream[Tick]
    val q = in.toDF().writeStream
      .foreachBatch(Streams.envelopeSinkBatch(dir, "none") _)
      .start()
    try {
      in.addData(Tick("s0", t(1), 1.0, """{"k": 1}"""))
      q.processAllAvailable()
      in.addData(Tick("s1", t(2), 2.0, """{"k": 2}"""))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(s"$dir/batch=*")
    assert(rows.count() === 2)
    val value = rows.selectExpr("cast(value as string) v").as[String]
      .collect().sorted.head
    assert(value.startsWith("""{"SlaveID":"s0","Hostname":"host-s0","Port":5051"""))
    assert(value.contains(""""Metrics":{"k":1}"""))
  }

  test("S33 streaming incremental-MV merge: replay-idempotent partial deltas, view ≡ from-scratch, fold-compaction pre-merges") {
    import graft.streaming.ValSeen
    import graft.operators.DeltaStore
    val view = java.nio.file.Files.createTempDirectory("s33_view").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s33_ckpt").toString
    val keys = Seq("grp")
    val in = MemoryStream[ValSeen]
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.mvMergeSinkBatch(view, keys, "v") _)
      .start()
    val wave1 = Seq(ValSeen("a", t(1), 10L), ValSeen("a", t(2), 20L),
      ValSeen("b", t(3), 5L))
    val wave2 = Seq(ValSeen("a", t(4), 30L), ValSeen("c", t(5), 7L))
    val wave3 = Seq(ValSeen("b", t(6), 15L), ValSeen("c", t(7), 3L))
    // CHAOS posture: every wave runs in its own query incarnation from
    // the shared checkpoint — kill-and-resume between every batch
    def wave(w: Seq[ValSeen]): Unit = {
      val q = start()
      try { in.addData(w: _*); q.processAllAvailable() } finally q.stop()
    }
    wave(wave1); wave(wave2) // delta=0, delta=1
    def viewRows(): Seq[(String, Long, Long, Double)] =
      Streams.mvViewSnapshot(spark, view, keys)
        .selectExpr("grp", "cnt", "CAST(total AS BIGINT)", "avg_value")
        .as[(String, Long, Long, Double)].collect().sorted.toSeq
    def scratch(rows: Seq[ValSeen]): Seq[(String, Long, Long, Double)] =
      rows.toDF().groupBy("grp")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("cnt"),
          org.apache.spark.sql.functions.sum("v").as("total"))
        .selectExpr("grp", "cnt", "total",
          "CAST(total AS DOUBLE) / cnt AS avg_value")
        .as[(String, Long, Long, Double)].collect().sorted.toSeq
    val twoWaves = viewRows()
    assert(twoWaves === scratch(wave1 ++ wave2),
      "merged view must equal the from-scratch aggregate")
    // replay idempotence: re-running a batch id rewrites its partials
    Streams.mvMergeSinkBatch(view, keys, "v")(wave1.toDF(), 0L)
    assert(viewRows() === twoWaves)
    // fold-compaction pre-merges: base converges to ONE row per key and
    // a reader racing the fold (mid-hook) still sees the same view
    var midChecked = false
    Streams.compactMvView(spark, view, keys, uptoBatch = 2L, () => {
      assert(viewRows() === twoWaves); midChecked = true
    })
    assert(midChecked)
    assert(viewRows() === twoWaves)
    val snap = DeltaStore.current(spark, view)
    assert(snap.gen === 1L && snap.foldedBelow === 2L)
    val baseRows = spark.read.parquet(s"$view/folded_g1")
    assert(baseRows.count() === baseRows.select("grp").distinct().count(),
      "the fold must pre-merge to one row per key")
    // ingest resumes onto the compacted view from the same checkpoint
    wave(wave3) // delta=2
    assert(viewRows() === scratch(wave1 ++ wave2 ++ wave3))
  }

  test("mvViewSnapshot of a never-ingested store is an empty TYPED view") {
    // the scaladoc contract: selecting the key columns (or unioning
    // against the snapshot) must work BEFORE the first delta lands —
    // an untyped emptyDataFrame here used to throw AnalysisException
    val view = java.nio.file.Files.createTempDirectory("s33_empty").toString
    val snap = Streams.mvViewSnapshot(spark, view, Seq("grp"))
    assert(snap.columns.toSeq === Seq("grp", "cnt", "total", "avg_value"))
    assert(snap.select("grp", "cnt", "total", "avg_value").count() === 0L)
    // and it merges with a non-empty snapshot of the same key contract
    Streams.mvMergeSinkBatch(view, Seq("grp"), "v")(
      Seq(("a", 4L)).toDF("grp", "v"), 0L)
    val one = Streams.mvViewSnapshot(spark, view, Seq("grp"))
    assert(one.unionByName(snap).count() === 1L)
  }

  test("mvViewSnapshot with a NON-STRING key: empty and post-ingest " +
      "schemas agree (keyTypes pins the empty branch)") {
    // r13 verdict item 6 / ADVICE: the never-ingested branch hard-coded
    // StringType per key, so a long-keyed view's empty snapshot diverged
    // from its post-ingest schema ONLY in the empty case. keyTypes closes
    // it: the empty snapshot must union/join cleanly with the real one.
    import org.apache.spark.sql.types.LongType
    val view = java.nio.file.Files.createTempDirectory("s33_longkey").toString
    val empty = Streams.mvViewSnapshot(spark, view, Seq("uid"), Seq(LongType))
    assert(empty.schema("uid").dataType === LongType)
    Streams.mvMergeSinkBatch(view, Seq("uid"), "v")(
      Seq((7L, 4L), (7L, 2L)).toDF("uid", "v"), 0L)
    val full = Streams.mvViewSnapshot(spark, view, Seq("uid"), Seq(LongType))
    assert(full.schema("uid").dataType === LongType)
    // schema-compatible in the exact failure mode the verdict named
    assert(full.unionByName(empty).count() === 1L)
    assert(full.select("uid", "cnt", "total").as[(Long, Long, Long)]
      .collect().toSeq === Seq((7L, 2L, 6L)))
    // and a mismatched keyTypes arity fails loudly, not silently
    val err = intercept[IllegalArgumentException] {
      Streams.mvViewSnapshot(spark, view, Seq("uid", "day"), Seq(LongType))
    }
    assert(err.getMessage.contains("one DataType per key column"))
  }

  test("S34 IVF-PQ delta compaction: snapshot-isolated probes, grace GC, ingest resumes onto the folded store") {
    import graft.operators.{DeltaStore, Similarity}
    val layout = java.nio.file.Files.createTempDirectory("s34_layout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s34_ckpt").toString
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding")
    Similarity.writeIvfPqLayout(base, layout, nCells = 4)
    val oddRows = odd.collect()
      .map(r => VecIngest(r.getLong(0), r.getSeq[Float](1)))
    val third = oddRows.length / 3
    val (wave1, rest) = oddRows.splitAt(third)
    val (wave2, wave3) = rest.splitAt(third)
    val in = MemoryStream[VecIngest]
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.annIngestSinkBatch(layout) _)
      .start()
    def wave(w: Seq[VecIngest]): Unit = {
      val q = start()
      try { in.addData(w: _*); q.processAllAvailable() } finally q.stop()
    }
    wave(wave1.toSeq) // delta=0
    wave(wave2.toSeq) // delta=1
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.select("vec_id", "embedding")
    def probe(): Set[(Long, Long)] =
      Similarity.probeIvfPqLayoutAll(layout, queries, corpus,
          k = 10, nProbe = 4, shortlistFactor = 1000)
        .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val pre = probe()
    // MID-compaction (folded generation written, manifest not yet
    // published): a concurrent probe resolves the OLD manifest and
    // serves exactly the pre-compaction snapshot
    var midChecked = false
    Similarity.compactIvfPqLayout(spark, layout, () => {
      assert(probe() === pre,
        "a probe mid-compaction must equal the pre-compaction snapshot")
      midChecked = true
    })
    assert(midChecked)
    // POST-compaction: identical answers, now served from generation 1;
    // the folded deltas and generation 0 survive until the NEXT
    // compaction's grace GC
    assert(probe() === pre)
    assert(DeltaStore.current(spark, layout) ===
      DeltaStore.Snapshot(1L, 2L))
    assert(new java.io.File(s"$layout/codes_g1").isDirectory)
    assert(new java.io.File(s"$layout/codes").isDirectory)
    // a REPLAY of an already-folded batch rewrites a below-watermark
    // directory that the serving snapshot ignores
    Streams.annIngestSinkBatch(layout)(
      wave1.toSeq.toDF("vec_id", "embedding"), 0L)
    assert(probe() === pre)
    // ingest RESUMES onto the compacted store from the same checkpoint
    wave(wave3.toSeq) // delta=2, past the fold watermark
    val after = probe()
    val exact = Similarity.cosineTopK(queries, corpus, 10)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(after === exact)
    // SECOND compaction: folds delta=2 into generation 2 and grace-GCs
    // generation 0 plus every below-watermark delta (the replay garbage
    // included); answers unchanged
    Similarity.compactIvfPqLayout(spark, layout)
    assert(probe() === after)
    assert(DeltaStore.current(spark, layout) ===
      DeltaStore.Snapshot(2L, 3L))
    assert(!new java.io.File(s"$layout/codes").exists)
    def liveDeltas() = new java.io.File(s"$layout/codes_deltas").listFiles()
      .filter(_.getName.startsWith("delta=")).map(_.getName).toSeq
    // delta=2 was folded by THIS compaction, so its directory keeps the
    // one-cycle grace; deltas 0/1 (and the replay garbage) are swept
    assert(liveDeltas() === Seq("delta=2"))
    // a further compaction with nothing new to fold still runs the
    // grace GC — the store converges to one generation, zero deltas
    Similarity.compactIvfPqLayout(spark, layout)
    assert(liveDeltas().isEmpty,
      s"graced deltas must be swept next cycle: ${liveDeltas()}")
    assert(probe() === after)
    // the SQL read path serves the same folded snapshot
    Tables.registerLayoutViews(spark, layout, prefix = "s34")
    assert(spark.table("s34_codes").count() ===
      base.count() + oddRows.length)
  }

  test("S34 signature-store compaction: replays and decisions identical across the fold") {
    import graft.operators.{Dedup, DeltaStore}
    val store = java.nio.file.Files.createTempDirectory("s34_sig").toString
    val out = java.nio.file.Files.createTempDirectory("s34_out").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .orderBy("doc_id").limit(90).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val Array(b0, b1, b2) = docs.grouped(30).toArray
    def df(b: Array[(Long, String)]) = b.toSeq.toDF("doc_id", "text")
    val sink = Streams.nearDedupSinkBatch(store, out, 0.5) _
    sink(df(b0), 0L)
    sink(df(b1), 1L)
    val out1 = spark.read.parquet(s"$out/batch=1").collect()
      .map(_.toString).sorted.toSeq
    // fold batch 0 (below the last committed id — batch 1 stays live);
    // a probe through the store reader mid-fold sees the unfolded state
    var midChecked = false
    Dedup.compactSignatureStore(spark, store, uptoBatch = 1L, () => {
      assert(DeltaStore.snapshotPureDelta(spark, store).get.count() ===
        spark.read.parquet(s"$store/delta=0").count() +
          spark.read.parquet(s"$store/delta=1").count())
      midChecked = true
    })
    assert(midChecked)
    // a REPLAYED batch 1 reads exactly the store state it saw first time
    // (delta < 1 now comes out of the folded base) - decisions identical
    sink(df(b1), 1L)
    assert(spark.read.parquet(s"$out/batch=1").collect()
      .map(_.toString).sorted.toSeq === out1)
    // batch 2 runs against folded(b0) + live delta(b1): decisions equal
    // the batch twin over the union store
    sink(df(b2), 2L)
    val expected = Dedup.incrementalNearAgainst(df(b2),
        Dedup.signatureStore(df(b0).unionByName(df(b1)), "text", "doc_id"),
        "text", "doc_id", 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(spark.read.parquet(s"$out/batch=2").collect()
      .map(_.toString).sorted.toSeq === expected)
    // second fold (everything below 3): the SQL view over the store
    // serves the full folded signature set; batch-0 delta dir is GC'd
    Dedup.compactSignatureStore(spark, store, uptoBatch = 3L)
    Dedup.compactSignatureStore(spark, store, uptoBatch = 3L) // no-op + GC
    val live = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("delta=")).map(_.getName).toSeq
    assert(live.isEmpty, s"folded deltas must be GC'd: $live")
    Tables.registerSignatureStoreView(spark, store, "s34_sigs")
    assert(spark.table("s34_sigs").count() ===
      Dedup.signatureStore(
        df(b0).unionByName(df(b1)).unionByName(df(b2)),
        "text", "doc_id").count())
  }

  test("S34 contamination-store compaction: the flagged id set survives folds and replay garbage") {
    import graft.operators.{Decontaminate, DeltaStore}
    val gate = java.nio.file.Files.createTempDirectory("s34_gate").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 25 === 0)
    val train = docs.filter(col("doc_id") % 25 =!= 0)
      .orderBy("doc_id").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val Array(b0, b1) = train.grouped(30).toArray
    def df(b: Array[(Long, String)]) = b.toSeq.toDF("doc_id", "text")
    val bloom = Streams.buildDecontaminationGate(eval, "text", 5, gate)
    val sink = Streams.decontaminateSinkBatch(gate, bloom, 5) _
    sink(df(b0), 0L)
    sink(df(b1), 1L)
    val pre = Decontaminate.contaminatedStoreIds(spark, gate)
      .as[Long].collect().sorted.toSeq
    // the flag set equals the batch operator over the union (S26's
    // existing contract), and folding must not move it
    val batch = Decontaminate.contaminatedIds(
        df(b0).unionByName(df(b1)), eval, "text", "doc_id", 5)
      .as[Long].collect().sorted.toSeq
    assert(pre === batch)
    var midChecked = false
    Decontaminate.compactContaminatedStore(spark, gate, uptoBatch = 2L,
      () => {
        assert(Decontaminate.contaminatedStoreIds(spark, gate)
          .as[Long].collect().sorted.toSeq === pre)
        midChecked = true
      })
    assert(midChecked)
    assert(Decontaminate.contaminatedStoreIds(spark, gate)
      .as[Long].collect().sorted.toSeq === pre)
    // replay garbage: a restarted stream rewriting a folded batch's
    // delta dir must not re-enter the snapshot
    sink(df(b0), 0L)
    assert(Decontaminate.contaminatedStoreIds(spark, gate)
      .as[Long].collect().sorted.toSeq === pre)
    // next compaction sweeps the garbage and keeps the set
    Decontaminate.compactContaminatedStore(spark, gate, uptoBatch = 2L)
    assert(Decontaminate.contaminatedStoreIds(spark, gate)
      .as[Long].collect().sorted.toSeq === pre)
    assert(DeltaStore.current(spark, s"$gate/contaminated").gen >= 1L)
  }

  test("S37 gap-quantile monitor: two chained stateful operators, gaps cross the restart boundary") {
    import graft.streaming.{QuantileRow, TypedEvent}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s37_ckpt").toString
      val in = MemoryStream[TypedEvent]
      val sink = new scala.collection.mutable.ArrayBuffer[QuantileRow]
      val W = 1000000L // 1-second buckets
      def start() = Streams.gapQuantileMonitor(in.toDS(), W, Seq(50, 99))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[QuantileRow],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      def awaitN(grp: String, want: Long): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        def last() = sink.synchronized(
          sink.filter(_.grp == grp).lastOption.map(_.n))
        while (!last().contains(want) && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(last() === Some(want))
      }
      def bracket(grp: String, n: Long, p: Long): (Long, Long) = {
        val r = sink.synchronized(sink.filter(x =>
          x.grp == grp && x.n == n && x.p == p)).last
        (r.q_lo_cents, r.q_hi_cents)
      }
      // wave 1 — user 1: a@1s, b@3s, a@6s (gaps b:2s, a:3s);
      //          user 2: a@10s, a@11s (gap a:1s)
      val q1 = start()
      try {
        in.addData(
          TypedEvent(1L, 1L, t(1), "a"), TypedEvent(1L, 2L, t(3), "b"),
          TypedEvent(1L, 3L, t(6), "a"),
          TypedEvent(2L, 4L, t(10), "a"), TypedEvent(2L, 5L, t(11), "a"))
        awaitN("a", 2L); awaitN("b", 1L)
        // type a gaps {1s, 3s}: p50 at pos 1 → the 1s bucket, p99 at
        // pos 2 → the 3s bucket; type b {2s}: both → 2s bucket
        assert(bracket("a", 2L, 50L) === ((1000000L, 1999999L)))
        assert(bracket("a", 2L, 99L) === ((3000000L, 3999999L)))
        assert(bracket("b", 1L, 99L) === ((2000000L, 2999999L)))
      } finally stopAtCommitBoundary(q1, ckpt)
      // kill-and-resume, then user 1's next event gaps 14s back to its
      // LAST PRE-RESTART event — both chained states must have restored
      // (the user ValueState for the gap, the type MapState for counts);
      // a brand-new user emits no gap at all
      val q2 = start()
      try {
        in.addData(TypedEvent(1L, 6L, t(20), "b"),
          TypedEvent(9L, 7L, t(21), "a"))
        awaitN("b", 2L)
        assert(bracket("b", 2L, 50L) === ((2000000L, 2999999L)))
        assert(bracket("b", 2L, 99L) === ((14000000L, 14999999L)))
        // type a unchanged by the gapless new user: still n=2
        assert(sink.synchronized(
          sink.filter(_.grp == "a").map(_.n).max) === 2L)
        // cross-batch STRAGGLER (user 1, ts behind its 20s anchor): the
        // late-data contract drops it — no negative gap enters the
        // population and the anchor is not rewound (user 1's next
        // in-order event still gaps from 20s, not 15s)
        in.addData(TypedEvent(1L, 8L, t(15), "a"))
        in.addData(TypedEvent(1L, 9L, t(23), "b"))
        awaitN("b", 3L)
        assert(bracket("b", 3L, 50L) === ((3000000L, 3999999L)))
        assert(sink.synchronized(
          sink.filter(_.grp == "a").map(_.n).max) === 2L,
          "a straggler must not add a (negative) gap")
      } finally q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("S35 compactor crash between fold write and publish: manifest untouched, retry overwrites the orphan (all four stores)") {
    // the single-writer/self-healing argument as a checked fact: kill the
    // compactor AFTER the folded generation is written but BEFORE the
    // manifest publish (the midCompactionHook seam), assert readers still
    // resolve the old snapshot and the orphan generation sits
    // unreferenced on disk, then re-run the compactor and assert it
    // recomputes the SAME next generation, overwrites the orphan
    // (mode=overwrite) and converges — no manual cleanup, no double-serve
    import graft.operators.{Decontaminate, Dedup, DeltaStore, Similarity}
    class Crash extends RuntimeException("injected compactor crash")
    val boom: () => Unit = () => throw new Crash

    // --- S33 MV partial-aggregate store (fold = key re-merge) ---
    val view = java.nio.file.Files.createTempDirectory("s35_view").toString
    val keys = Seq("grp")
    Streams.mvMergeSinkBatch(view, keys, "v")(
      Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("grp", "v"), 0L)
    Streams.mvMergeSinkBatch(view, keys, "v")(
      Seq(("a", 30L), ("c", 7L)).toDF("grp", "v"), 1L)
    def mvRows(): Seq[String] = Streams.mvViewSnapshot(spark, view, keys)
      .collect().map(_.toString).sorted.toSeq
    val mvPre = mvRows()
    intercept[Crash] {
      Streams.compactMvView(spark, view, keys, uptoBatch = 2L, boom)
    }
    assert(DeltaStore.current(spark, view) === DeltaStore.Gen0,
      "a crash before publish must leave the manifest untouched")
    assert(mvRows() === mvPre)
    assert(new java.io.File(s"$view/folded_g1").isDirectory,
      "the orphan folded generation stays on disk, unreferenced")
    Streams.compactMvView(spark, view, keys, uptoBatch = 2L)
    assert(DeltaStore.current(spark, view) === DeltaStore.Snapshot(1L, 2L))
    assert(mvRows() === mvPre)
    // crash again on the NEXT cycle (gen1 → gen2, with grace GC in play):
    // the orphan folded_g2 is rewritten on retry, gen1 survives as the
    // serving base throughout
    Streams.mvMergeSinkBatch(view, keys, "v")(
      Seq(("b", 15L), ("c", 3L)).toDF("grp", "v"), 2L)
    val mvThree = mvRows()
    intercept[Crash] {
      Streams.compactMvView(spark, view, keys, uptoBatch = 3L, boom)
    }
    assert(DeltaStore.current(spark, view) === DeltaStore.Snapshot(1L, 2L))
    assert(mvRows() === mvThree)
    Streams.compactMvView(spark, view, keys, uptoBatch = 3L)
    assert(DeltaStore.current(spark, view) === DeltaStore.Snapshot(2L, 3L))
    assert(mvRows() === mvThree)

    // --- S15 MinHash signature store (identity fold) ---
    val store = java.nio.file.Files.createTempDirectory("s35_sig").toString
    val out = java.nio.file.Files.createTempDirectory("s35_out").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .orderBy("doc_id").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val Array(c0, c1) = docs.grouped(20).toArray
    val sink = Streams.nearDedupSinkBatch(store, out, 0.5) _
    sink(c0.toSeq.toDF("doc_id", "text"), 0L)
    sink(c1.toSeq.toDF("doc_id", "text"), 1L)
    def sigRows(): Seq[String] = DeltaStore.snapshotPureDelta(spark, store)
      .get.collect().map(_.toString).sorted.toSeq
    val sigPre = sigRows()
    intercept[Crash] { Dedup.compactSignatureStore(spark, store, 2L, boom) }
    assert(DeltaStore.current(spark, store) === DeltaStore.Gen0)
    assert(sigRows() === sigPre)
    assert(new java.io.File(s"$store/folded_g1").isDirectory)
    Dedup.compactSignatureStore(spark, store, 2L)
    assert(DeltaStore.current(spark, store) === DeltaStore.Snapshot(1L, 2L))
    assert(sigRows() === sigPre)

    // --- S26 contamination-id store (identity fold) ---
    val gate = java.nio.file.Files.createTempDirectory("s35_gate").toString
    val all = Tables.documents(spark, sf).select("doc_id", "text")
    val eval = all.filter(col("doc_id") % 25 === 0)
    val train = all.filter(col("doc_id") % 25 =!= 0)
      .orderBy("doc_id").limit(30)
    val bloom = Streams.buildDecontaminationGate(eval, "text", 5, gate)
    Streams.decontaminateSinkBatch(gate, bloom, 5)(train, 0L)
    def flagged(): Seq[Long] = Decontaminate.contaminatedStoreIds(spark, gate)
      .as[Long].collect().sorted.toSeq
    val flaggedPre = flagged()
    intercept[Crash] {
      Decontaminate.compactContaminatedStore(spark, gate, 1L, boom)
    }
    assert(DeltaStore.current(spark, s"$gate/contaminated") ===
      DeltaStore.Gen0)
    assert(flagged() === flaggedPre)
    Decontaminate.compactContaminatedStore(spark, gate, 1L)
    assert(DeltaStore.current(spark, s"$gate/contaminated") ===
      DeltaStore.Snapshot(1L, 1L))
    assert(flagged() === flaggedPre)

    // --- S22 IVF-PQ codes store (cell-partitioned fold) ---
    val layout = java.nio.file.Files.createTempDirectory("s35_ivf").toString
    val emb = Tables.embeddings(spark, sf)
    Similarity.writeIvfPqLayout(
      emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding"),
      layout, nCells = 2)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding").orderBy("vec_id").limit(20)
    Streams.annIngestSinkBatch(layout)(odd, 0L)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.select("vec_id", "embedding")
    def probe(): Set[(Long, Long)] =
      Similarity.probeIvfPqLayoutAll(layout, queries, corpus,
          k = 5, nProbe = 2, shortlistFactor = 1000)
        .select(col("q_id"), col("vec_id")).as[(Long, Long)]
        .collect().toSet
    val probePre = probe()
    intercept[Crash] { Similarity.compactIvfPqLayout(spark, layout, boom) }
    assert(DeltaStore.current(spark, layout) === DeltaStore.Gen0)
    assert(probe() === probePre)
    assert(new java.io.File(s"$layout/codes_g1").isDirectory)
    Similarity.compactIvfPqLayout(spark, layout)
    assert(DeltaStore.current(spark, layout) === DeltaStore.Snapshot(1L, 1L))
    assert(probe() === probePre)
  }

  test("S36 quantile monitor: bucket-exact type-1 brackets, MapState survives restart, agrees with the batch pick") {
    import graft.streaming.{QuantileRow, ValObs}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("s36_ckpt").toString
      val in = MemoryStream[ValObs]
      val sink = new scala.collection.mutable.ArrayBuffer[QuantileRow]
      val W = 100L
      def start() = Streams.quantileMonitor(in.toDS(), W, Seq(25, 50, 99))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[QuantileRow],
            _: Long) => sink.synchronized { sink ++= b.collect() }; () }
        .start()
      def awaitN(want: Long): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        def last() = sink.synchronized(
          sink.filter(_.grp == "g").lastOption.map(_.n))
        while (!last().contains(want) && System.nanoTime() < deadline)
          Thread.sleep(100L)
        assert(last() === Some(want))
      }
      // every observed prefix defines the expected rows EXACTLY (counts
      // are order-independent): recompute the bracket from first
      // principles and demand equality, plus the bracket property
      // against the true sorted values
      def check(values: Seq[Long]): Unit = {
        val n = values.size.toLong
        val rows = sink.synchronized(
          sink.filter(r => r.grp == "g" && r.n == n))
        assert(rows.map(_.p).sorted === Seq(25L, 50L, 99L))
        val sorted = values.sorted
        for (r <- rows) {
          val pos = math.max(1L, (r.p * n + 99L) / 100L)
          assert(r.pos === pos)
          val exact = sorted((pos - 1).toInt) // true type-1 quantile
          assert(r.q_lo_cents <= exact && exact <= r.q_hi_cents,
            s"p=${r.p}: exact $exact outside [${r.q_lo_cents}, ${r.q_hi_cents}]")
          assert(Math.floorDiv(exact, W) * W === r.q_lo_cents,
            s"p=${r.p}: bucket must be the one straddling pos $pos")
          assert(r.q_hi_cents === r.q_lo_cents + W - 1L)
        }
      }
      val wave1 = Seq(120L, 130L, 250L, 260L, 370L, -40L)
      val wave2 = Seq(380L, 390L, 505L, 111L)
      val q1 = start()
      try {
        in.addData(wave1.zipWithIndex.map { case (v, i) =>
          ValObs("g", t(i + 1), v) }: _*)
        awaitN(6L); check(wave1)
      } finally stopAtCommitBoundary(q1, ckpt)
      // kill-and-resume: the bucket MapState must restore and wave 2
      // answers must reflect the FULL prefix
      val q2 = start()
      try {
        in.addData(wave2.zipWithIndex.map { case (v, i) =>
          ValObs("g", t(10 + i), v) }: _*)
        awaitN(10L); check(wave1 ++ wave2)
      } finally q2.stop()
      // bucket agreement with the batch two-phase pick: the straddling
      // bucket of the p50 pick equals floorDiv(exact quantile, W) — the
      // Ranks contract restated for the stream (already asserted inside
      // check()); and negative values bucket correctly (floorDiv)
      val neg = sink.synchronized(sink.filter(r =>
        r.grp == "g" && r.n == 6L && r.p == 25L)).last
      assert(neg.q_lo_cents % W === 0L || neg.q_lo_cents < 0L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }
}
