package graft

import org.apache.spark.sql.functions._

/** Degenerate-corpus robustness: every governance operator must return an
  * EMPTY (or well-defined) result on empty / single-row / pair-less inputs
  * rather than throwing — at 100 TB an empty partition, a source with one
  * document, or a day with no delta are routine, and an operator that NPEs
  * on them kills the whole job. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("winnow, CDC, encode, URL dedup and snapshot diff accept an empty corpus") {
    assert(graft.operators.Winnow
      .fingerprints(emptyDocs, "text", "doc_id", 3, 4).count() === 0L)
    assert(graft.operators.Winnow
      .sharedFingerprintPairs(emptyDocs, "text", "doc_id", 3, 4, 2L, 10L)
      .count() === 0L)
    assert(graft.operators.Packing
      .cdcChunks(emptyDocs, "text", "doc_id").count() === 0L)
    assert(graft.operators.Vocab
      .encodeIds(emptyDocs, "text", "doc_id", 10).count() === 0L)
    assert(graft.operators.UrlOps
      .dedupByUrl(emptyDocs.withColumnRenamed("text", "url"), "url", "doc_id")
      .count() === 0L)
    assert(graft.operators.Layout
      .snapshotDiff(emptyDocs, emptyDocs, "doc_id", "text").count() === 0L)
  }

  test("round-6 additions accept empty and degenerate corpora") {
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    // Boilerplate: empty corpus → empty result; single doc → nothing is
    // boilerplate (df=1 everywhere), everything kept.
    assert(graft.operators.Boilerplate
      .strip(emptySrc, "text", "doc_id", "source", minDf = 3).count() === 0L)
    val one = Seq((1L, "s", "a\nb")).toDF("doc_id", "source", "text")
    val kept = graft.operators.Boilerplate
      .strip(one, "text", "doc_id", "source", minDf = 3).collect()
    assert(kept.length == 1 && kept(0).getLong(2) == 2L)
    // BPE: empty corpus → zero merges, not an exception; a corpus of
    // single-char words exhausts before nMerges and stops early.
    assert(graft.operators.Bpe.train(emptyDocs, "text", nMerges = 3)
      .count() === 0L)
    val chars = Seq("ab ab").toDF("text")
    val m = graft.operators.Bpe.train(chars, "text", nMerges = 5).collect()
    assert(m.length == 1 && m.head.getString(1) == "ab") // then exhausted
    // DSIR: empty corpus and all-short docs (no bigrams) → empty scores.
    assert(graft.operators.Dsir.select(
      emptyDocs.withColumn("t", lit(true)), "text", "doc_id", col("t"))
      .count() === 0L)
    val short = Seq((1L, true, "word")).toDF("doc_id", "t", "text")
    assert(graft.operators.Dsir.select(short, "text", "doc_id", col("t"))
      .count() === 0L)
    // Codec expressions on empty binary: null, never a throw.
    val nulls = Seq(Array.emptyByteArray).toDF("b")
      .select(
        graft.functions.MediaFunctions.pngDecodeStats(col("b")).as("p"),
        graft.functions.MediaFunctions.imageDecodeStats(col("b")).as("i"),
        graft.functions.MediaFunctions.aviFrames(col("b")).as("a"))
      .collect()
    assert(nulls(0).isNullAt(0) && nulls(0).isNullAt(1) && nulls(0).isNullAt(2))
  }

  test("drift statistics degrade cleanly: one source, one token, no pairs") {
    val one = Seq(("solo", "only only only")).toDF("source", "text")
    // a single source has no unordered pair: JSD output is empty, not a crash
    assert(graft.operators.Vocab.jsDivergence(one, "text", "source")
      .count() === 0L)
    // one distinct token -> one rank -> zero regression denominator -> null
    val z = graft.operators.Vocab.zipfSlope(one, "text", "source").collect()
    assert(z.length === 1 && z.head.isNullAt(z.head.fieldIndex("slope_micro")))
    // keyness with a single slice: nothing is enriched vs an empty rest
    assert(graft.operators.Vocab.keyness(one, "text", "source", 5, 1L)
      .count() === 0L)
  }

  test("bloom decontamination with an EMPTY eval set flags nothing") {
    val train = Seq((1L, "some ordinary training text here okay"))
      .toDF("doc_id", "text")
    val eval = emptyDocs
    assert(graft.operators.Decontaminate
      .contaminatedIdsBloom(train, eval, "text", "doc_id", 3).count() === 0L)
    assert(graft.operators.Decontaminate
      .contaminatedIds(train, eval, "text", "doc_id", 3).count() === 0L)
  }

  test("pagerank and aggregate merge accept empty inputs") {
    val noEdges = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(graft.operators.Clusters
      .pageRankWeighted(noEdges, "src", "dst", "w", iterations = 2)
      .count() === 0L)
    val noPartials = Seq.empty[(String, Long, Long)].toDF("k", "cnt", "total")
    assert(graft.operators.Layout
      .mergePartialAggs(noPartials, noPartials, Seq("k")).count() === 0L)
  }

  test("scan round-trip matches the original parquet and leaves no scratch behind") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def scratchDirs(): Set[String] =
      Files.list(Paths.get(System.getProperty("java.io.tmpdir"))).iterator()
        .asScala.map(_.getFileName.toString)
        .filter(_.startsWith("graft_roundtrip")).toSet
    val before = scratchDirs()
    val rows = graft.queries.Filters.qScanRoundtrip(spark, sf).collect()
    assert(rows.nonEmpty)
    // the eager localCheckpoint lets the query delete its ORC+CSV copies
    // before returning — repeated harness runs must accumulate nothing
    assert(scratchDirs() === before)
  }

  test("round-7 operators accept empty and undersized corpora") {
    val noDocs = emptyDocs
    assert(graft.operators.Dedup
      .containmentPairs(noDocs, "text", "doc_id", 3, 0.5).count() === 0L)
    assert(graft.operators.Ranking
      .sparseKnn(noDocs, "doc_id", "text", Seq(0L), 10).count() === 0L)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noQs = Seq.empty[(Long, Array[Float])].toDF("q_id", "q_emb")
    assert(graft.operators.Similarity.mmrTopK(noQs, noVecs, 3, poolSize = 5)
      .count() === 0L)
    assert(graft.operators.Similarity.farthestPointSample(noVecs, 3)
      .count() === 0L)
    // FPS with k larger than the corpus returns every vector once, ranked
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val fps = graft.operators.Similarity.farthestPointSample(tiny, 5)
      .select("vec_id").as[Long].collect().toSet
    assert(fps === Set(1L, 2L))
  }

  test("round-8 operators reject malformed configs and accept empty inputs") {
    import graft.operators.{Dedup, Profile, Similarity}
    // hammingPairs: band config bounds are caller bugs, not data errors
    val sigs = Seq((1L, 5L)).toDF("id", "sig")
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs(sigs, "id", "sig", bits = 0, maxHamming = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs(sigs, "id", "sig", bits = 9, maxHamming = 9)
    }
    // one-row / empty signature sets pair nothing
    assert(Dedup.hammingPairs(sigs, "id", "sig", 9, 1).count() === 0L)
    // keySkew rejects a nonsensical topN; empty input yields no rows
    intercept[IllegalArgumentException] {
      Profile.keySkew(sigs, "sig", topN = 0)
    }
    assert(Profile.keySkew(sigs.limit(0), "sig", 5).count() === 0L)
    // probing a layout path with no codebooks is a clear caller error
    val noLayout = graft.operators.Scratch.dir("no_layout")
    val q = Seq((1L, Array(1f, 0f))).toDF("q_id", "q_emb")
    val c = Seq((2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      Similarity.probePqLayout(noLayout, q, c, k = 1)
    }
    intercept[Exception] {
      Similarity.appendIvfPqLayout(c, noLayout)
    }
  }

  test("round-8 analytics degrade cleanly: empty events, empty groups, bad configs") {
    import graft.operators.{Funnel, Profile, Ranking}
    // funnel on an empty stream: every stage emits with 0 reach, conv 0,
    // null journey — dashboards read a complete stage frame, not a hole
    val noEvents = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("u", "et", "t")
    val f = Funnel.funnelStages(noEvents, "u", "et", "t", Seq("a", "b"))
      .collect().sortBy(_.getLong(0))
    assert(f.length === 2)
    assert(f.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L))
    assert(f.forall(_.isNullAt(4)))
    // funnel config errors are caller bugs
    intercept[IllegalArgumentException] {
      Funnel.funnelStages(noEvents, "u", "et", "t", Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelStages(noEvents, "u", "et", "t", Seq("a", "a"))
    }
    // gini on empty input returns one row of nulls (no division crash)
    val g = Profile.giniConcentration(
      Seq.empty[(String, Long)].toDF("grp", "w"), "grp", "w").collect().head
    assert(g.getLong(0) === 0L && g.isNullAt(2))
    // cusum and KS on empty inputs return no rows
    assert(Profile.cusumDrift(
      Seq.empty[(String, Long, Long)].toDF("grp", "slot", "n"),
      "grp", "slot", "n").count() === 0L)
    assert(Profile.ksByGroup(
      Seq.empty[(String, Long)].toDF("grp", "v"), "grp", "v").count() === 0L)
    // rrfFuse: an empty list contributes nothing but breaks nothing
    val one = Seq((1L, 1, 7L)).toDF("q_id", "rnk", "doc_id")
    val none = one.limit(0)
    val fused = Ranking.rrfFuse(Seq(one, none), k = 5).collect()
    assert(fused.length === 1 && fused.head.getLong(2) === 7L)
    intercept[IllegalArgumentException] { Ranking.rrfFuse(Seq.empty, 5) }
  }

  test("temporal operators degrade cleanly: empty events, single event, bad configs") {
    import graft.operators.Temporal
    val noEvents = Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("event_id", "user_id", "ts", "value")
    assert(Temporal.maxConcurrency(noEvents, "user_id", "ts", "event_id")
      .count() === 0L)
    assert(Temporal.dyadicEwma(noEvents, "user_id", "ts", "event_id", "value")
      .count() === 0L)
    assert(Temporal.ohlcBars(noEvents, "user_id", "ts", "event_id", "value")
      .count() === 0L)
    // one event: a zero-length session opens and closes at its instant —
    // peak 1; ewma of one point = the point; OHLC has open=close=high=low
    val one = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-05 10:30:00"),
      2.5)).toDF("event_id", "user_id", "ts", "value")
    val c = Temporal.maxConcurrency(one, "user_id", "ts", "event_id")
      .collect().head
    assert(c.getLong(1) === 1L && c.getLong(2) === 1L && c.getLong(3) === 1L)
    val e = Temporal.dyadicEwma(one, "user_id", "ts", "event_id", "value")
      .collect().head
    assert(e.getLong(2) === 2500000L && e.getLong(3) === 2500000L)
    val o = Temporal.ohlcBars(one, "user_id", "ts", "event_id", "value")
      .collect().head
    assert(o.getLong(2) === 2500000L && o.getLong(3) === 2500000L &&
      o.getLong(4) === 2500000L && o.getLong(5) === 2500000L)
    intercept[IllegalArgumentException] {
      Temporal.maxConcurrency(one, "user_id", "ts", "event_id", gapMinutes = 0)
    }
    intercept[IllegalArgumentException] {
      Temporal.dyadicEwma(one, "user_id", "ts", "event_id", "value", depth = 0)
    }
    // two overlapping single-user sessions can't exist (same user merges);
    // two users' overlapping sessions peak at 2 in the shared hour
    val two = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 1.0),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-05 10:20:00"), 1.0),
      (3L, 2L, java.sql.Timestamp.valueOf("2024-01-05 10:10:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val peaks = Temporal.maxConcurrency(two, "user_id", "ts", "event_id")
      .collect()
    assert(peaks.length === 1 && peaks.head.getLong(3) === 2L)
  }

  test("dqChecks and chi2Independence degrade cleanly and reject bad configs") {
    import graft.operators.Profile
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    // empty table: every rule reports 0 violations and passes — a gate
    // that fails-closed on an empty partition would block every backfill
    val rep = Profile.dqChecks(empty,
      predicateRules = Seq("v_not_null" -> col("v").isNull),
      uniqueRules = Seq("k_unique" -> Seq("k")),
      refRules = Seq(("k_ref", "k", Seq((1L, "x")).toDF("k", "v"), "k")))
      .collect()
    assert(rep.length === 3)
    assert(rep.forall(r => r.getLong(2) === 0L && r.getLong(3) === 1L))
    intercept[IllegalArgumentException] { Profile.dqChecks(empty, Nil) }
    intercept[IllegalArgumentException] {
      Profile.dqChecks(empty,
        Seq("dup" -> col("v").isNull, "dup" -> col("k").isNull))
    }
    // chi2: empty → no cells; a 1×1 table is perfectly dependent AND
    // perfectly expected — dev = n·n − n·n = 0, χ² = 0
    assert(Profile.chi2Independence(empty, "k", "v").count() === 0L)
    val one = Profile.chi2Independence(
      Seq(("x", "y"), ("x", "y")).toDF("a", "b"), "a", "b").collect().head
    assert(one.getLong(2) === 2L && one.getLong(3) === 2000L &&
      one.getLong(4) === 0L)
  }

  test("textrank on a pair-less corpus yields an empty keyword list") {
    // single-token documents produce no adjacency edges — the PageRank
    // loop must run its rounds over an empty graph and return nothing,
    // not divide by a zero out-weight or NPE on an empty nodes table
    import graft.operators.Clusters
    val single = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val ws = split(col("text"), " ")
    val pairs = single.select(explode(when(size(ws) > 1,
        arrays_zip(slice(ws, lit(1), size(ws) - 1).as("x"),
          slice(ws, lit(2), size(ws) - 1).as("y")))
      .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("p"))
    assert(pairs.count() === 0L)
    assert(Clusters.pageRankWeighted(
      Seq.empty[(String, String, Long)].toDF("src", "dst", "w"),
      "src", "dst", "w", iterations = 3).count() === 0L)
  }

  test("attribution and burstiness: direct fallback, metronome, degenerate users") {
    import graft.operators.Temporal
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: click then purchase 1h later → credited to click
      (1L, 1L, ts("2024-01-05 10:00:00"), 0.0, "click"),
      (2L, 1L, ts("2024-01-05 11:00:00"), 3.0, "purchase"),
      // u2: touch 8 days BEFORE purchase → outside the 7-day window
      (3L, 2L, ts("2024-01-01 10:00:00"), 0.0, "view"),
      (4L, 2L, ts("2024-01-09 11:00:00"), 5.0, "purchase"),
      // u3: no touch at all → direct; the later view must not be credited
      (5L, 3L, ts("2024-01-05 10:00:00"), 7.0, "purchase"),
      (6L, 3L, ts("2024-01-05 11:00:00"), 0.0, "view"))
      .toDF("event_id", "user_id", "ts", "value", "event_type")
    val att = Temporal.lastTouchAttribution(ev, "user_id", "ts", "event_id",
        "value", Seq("view", "click"), "purchase", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(att === Seq(("click", 1L, 3000000L), ("direct", 2L, 12000000L)))
    intercept[IllegalArgumentException] {
      Temporal.lastTouchAttribution(ev, "user_id", "ts", "event_id",
        "value", Seq("purchase"), "purchase", "event_type")
    }
    // burstiness: a metronome (equal gaps) is exactly −1000 milli; a user
    // whose events all share one instant has σ+μ = 0 → null, not NaN; a
    // single-gap user is filtered (variance needs 2)
    val b = Temporal.burstiness(Seq(
      (1L, 1L, ts("2024-01-05 10:00:00"), 0.0, "x"),
      (2L, 1L, ts("2024-01-05 10:10:00"), 0.0, "x"),
      (3L, 1L, ts("2024-01-05 10:20:00"), 0.0, "x"),
      (4L, 2L, ts("2024-01-05 10:00:00"), 0.0, "x"),
      (5L, 2L, ts("2024-01-05 10:00:00"), 0.0, "x"),
      (6L, 2L, ts("2024-01-05 10:00:00"), 0.0, "x"),
      (7L, 3L, ts("2024-01-05 10:00:00"), 0.0, "x"),
      (8L, 3L, ts("2024-01-05 10:10:00"), 0.0, "x"))
      .toDF("event_id", "user_id", "ts", "value", "event_type"),
      "user_id", "ts", "event_id").collect()
    assert(b.length === 2) // u3's single gap filtered
    val byUser = b.map(r => r.getLong(0) -> r).toMap
    assert(byUser(1L).getLong(3) === -1000L)
    assert(byUser(2L).isNullAt(3))
  }

  test("l-diversity suppresses homogeneous groups; LTV and winsorize handle tiny inputs") {
    import graft.operators.{Outliers, Profile, Retention}
    // six rows, one quasi group, ONE source: k=5 passes but l=2 must
    // suppress — the homogeneity attack k-anonymity alone misses
    val homog = Seq.tabulate(6)(i => (s"d$i", "en", "crawl"))
      .toDF("doc_id", "lang", "source")
    val ld = Profile.lDiversityCounts(homog, Seq("lang"), "source", 5L, 2L)
      .collect()
    assert(ld.length === 1 && ld.head.getString(0) === "*" &&
      ld.head.getLong(1) === 6L && ld.head.isNullAt(2))
    assert(Profile.kAnonCounts(homog, Seq("lang"), 5L)
      .collect().head.getString(0) === "en") // k alone would release it
    intercept[IllegalArgumentException] {
      Profile.lDiversityCounts(homog, Seq("source"), "source", 5L, 2L)
    }
    // LTV: one customer, one order → one (cohort, 0) cell, cum = revenue
    val oneOrder = Seq((7L, java.sql.Timestamp.valueOf("2024-03-05 00:00:00"),
      12.34)).toDF("cust", "odate", "price")
    val ltv = Retention.cohortLtv(oneOrder, "cust", "odate",
      expr("CAST(round(price * 100) AS BIGINT)")).collect()
    assert(ltv.length === 1 && ltv.head.getString(0) === "2024-03" &&
      ltv.head.getLong(1) === 0L && ltv.head.getLong(4) === 1234L)
    assert(Retention.cohortLtv(oneOrder.limit(0), "cust", "odate",
      expr("CAST(round(price * 100) AS BIGINT)")).count() === 0L)
    // winsorize: a single-row group clips nothing (low = high = value)
    val w = Outliers.winsorizedStats(
      Seq(("A", 1L, 500L)).toDF("g", "id", "cents"), "g", "id",
      col("cents")).collect().head
    assert(w.getLong(2) === 500L && w.getLong(3) === 500L &&
      w.getLong(4) === 0L && w.getLong(6) === 500L)
    intercept[IllegalArgumentException] {
      Outliers.winsorizedStats(homog, "lang", "doc_id", lit(1L), 95, 5)
    }
  }

  test("OLS and autocorrelation null out on degenerate variance, not NaN") {
    import graft.operators.Profile
    // constant x: vx = 0 → slope/intercept/r2 all null (vertical fit)
    val constX = Seq(("A", 5L, 10L), ("A", 5L, 20L), ("A", 5L, 30L))
      .toDF("g", "x", "y")
    val o = Profile.olsByGroup(constX, "g", col("x"), col("y"))
      .collect().head
    assert(o.getLong(1) === 3L && o.isNullAt(2) && o.isNullAt(3) &&
      o.isNullAt(4))
    // perfect line y = 2x + 1: slope 2e6, intercept 1e6, r2 = 1000
    val line = Seq(("B", 1L, 3L), ("B", 2L, 5L), ("B", 3L, 7L))
      .toDF("g", "x", "y")
    val l = Profile.olsByGroup(line, "g", col("x"), col("y")).collect().head
    assert(l.getLong(2) === 2000000L && l.getLong(3) === 1000000L &&
      l.getLong(4) === 1000L)
    // constant series: den = 0 → null ac1; a slot GAP breaks the pair
    // (3 slots 0,1,3 → only one adjacent pair) instead of faking adjacency
    val flat = Seq(("k", 0L, 7L), ("k", 1L, 7L), ("k", 2L, 7L))
      .toDF("grp", "slot", "v")
    assert(Profile.lag1Autocorr(flat, "grp", "slot", "v")
      .collect().head.isNullAt(3))
    val gappy = Seq(("k", 0L, 1L), ("k", 1L, 9L), ("k", 3L, 1L))
      .toDF("grp", "slot", "v")
    assert(Profile.lag1Autocorr(gappy, "grp", "slot", "v")
      .collect().head.getLong(2) === 1L)
  }

  test("pqTopK fails fast on an over-limit query batch (driver ADC-table guard)") {
    // The ADC tables are driver-built per query; an oversized queries
    // DataFrame must fail explained, never OOM the driver — the cap is
    // fused into the serve tail's limit(cap+1)-bounded collect, so the
    // driver holds at most cap+1 rows even on the failure path.
    val corpus = (0L until 8L).map(i =>
      (i, Array.tabulate(8)(j => (i + j).toFloat))).toDF("vec_id", "embedding")
    val tooMany = spark.range(graft.operators.Similarity.MaxPqQueryBatch + 1)
      .selectExpr("id AS q_id",
        "cast(array(1.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0) AS array<float>) AS q_emb")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.pqTopK(tooMany, corpus, k = 2, m = 2, ks = 2)
    }
    assert(e.getMessage.contains("MaxPqQueryBatch"))
  }

  test("BPE training rejects a private alphabet that would cross the surrogate range") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // 0x4E00 + 0x8A00 == 0xD800 exactly, so nMerges = 0x8A00 still keeps
    // every allocated symbol (max firstSymbol + nMerges - 1) below the
    // surrogates; one more crosses.
    intercept[IllegalArgumentException] {
      graft.operators.Bpe.trainVocab(docs, "text",
        nMerges = 0x8A01, firstSymbol = 0x4E00)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Bpe.trainOracleSql(nMerges = 0x8A01)
    }
  }

  test("round-10 operators accept empty / single-row / degenerate inputs") {
    // heapsLaw: empty corpus -> empty; one doc -> one checkpoint, null fit
    // (n*sxx - sx*sx = 0 with a single point)
    assert(graft.operators.Vocab
      .heapsLaw(emptyDocs.withColumn("source", lit("s")),
        "text", "doc_id", "source").count() === 0L)
    val one = graft.operators.Vocab.heapsLaw(
        Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source"),
        "text", "doc_id", "source").collect()
    assert(one.length === 1 && one(0).getLong(1) === 1L && one(0).isNullAt(2))
    // holtDyadic: empty -> empty; a single slot -> level = 1000*v, trend 0
    val emptySeries = Seq.empty[(String, Long, Long)].toDF("g", "t", "v")
    assert(graft.operators.Temporal
      .holtDyadic(emptySeries, "g", "t", "v").count() === 0L)
    val single = graft.operators.Temporal.holtDyadic(
        Seq(("g", 0L, 7L)).toDF("g", "t", "v"), "g", "t", "v").collect()(0)
    assert(single.getLong(1) === 7000L && single.getLong(2) === 0L)
    // paretoFrontier: empty -> empty; one row per group -> kept
    val emptySky = Seq.empty[(String, Long, Long, Long)]
      .toDF("g", "id", "c", "u")
    assert(graft.operators.Skyline
      .paretoFrontier(emptySky, "g", "id", "c", "u").count() === 0L)
    assert(graft.operators.Skyline.paretoFrontier(
        Seq(("s", 1L, 5L, 5L)).toDF("g", "id", "c", "u"),
        "g", "id", "c", "u").count() === 1L)
    // linkByBlocking: empty records -> empty; refuses spans <= maxEdits
    val emptyRecs = Seq.empty[(Long, Long, String)].toDF("rid", "g", "nm")
    assert(graft.operators.RecordLinkage.linkByBlocking(
      emptyRecs, "rid", "g", "nm", Seq((1, 2), (3, 2)), 1).count() === 0L)
    intercept[IllegalArgumentException] {
      graft.operators.RecordLinkage.linkByBlocking(
        emptyRecs, "rid", "g", "nm", Seq((1, 2)), 1)
    }
    // clusterSilhouette: a corpus smaller than k still classifies every
    // vector (DetQuantizer pads/caps cells as it does for the ANN family)
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val sil = graft.operators.Similarity.clusterSilhouette(tiny, k = 2)
    assert(sil.agg(sum("n_members")).head().getLong(0) === 2L)
  }

  test("brute-force eval operators reject an over-cap broadcast side fast") {
    // bitextMargin / annRadiusRecall broadcast their src/query side whole;
    // an over-cap side must fail with the named limit BEFORE the driver
    // materializes it. The guard is FUSED into the side's plan (zero
    // extra actions), so the failure surfaces at action time as a
    // SparkException chain wrapping the explained message — and the
    // broadcast build dies on its first evaluated row, never after
    // collecting cap+1 rows.
    import graft.operators.Similarity
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val cap = Similarity.MaxBroadcastEvalSide
    val bigSrc = spark.range(cap + 1).selectExpr("id AS s_id",
      "cast(array(1.0, 0.0) AS array<float>) AS s_emb")
    val tgt = Seq((1L, Array(1.0f, 0.0f))).toDF("t_id", "t_emb")
    val e1 = intercept[Exception] {
      // bitextMargin checkpoints its kernel pass eagerly, so the fused
      // guard fires inside the call
      Similarity.bitextMargin(bigSrc, tgt, k = 1).count()
    }
    assert(chain(e1).contains("MaxBroadcastEvalSide"), chain(e1))
    val bigQ = spark.range(cap + 1).selectExpr("id AS q_id",
      "cast(array(1.0, 0.0) AS array<float>) AS q_emb")
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      // collect(), not count(): count() references no columns, so the
      // optimizer legitimately ELIMINATES the unique-keyed left joins —
      // including the guarded truth side — and the fused guard (like the
      // kernel pass it protects) never runs. That elimination is the
      // optimizer doing its job; the guard exists for plans that DO the
      // work.
      Similarity.annRadiusRecall(bigQ, corpus, 0.5).collect()
    }
    assert(chain(e2).contains("MaxBroadcastEvalSide"), chain(e2))
  }

  test("cosinePairsExact rejects a corpus past the Ω(n²) time cap with the scale paths named") {
    // The tile grid bounds MEMORY at any n, but nothing else bounds TIME:
    // an unguarded corpus-scale call would run for days instead of
    // failing toward semDedup / the gated path. The guard reuses the
    // count() that sizes the adaptive grid — no extra action.
    import graft.operators.Similarity
    val six = spark.range(6).selectExpr("id AS vec_id",
      "cast(array(1.0, 0.0) AS array<float>) AS embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.cosinePairsExact(six, 0.5, maxRows = 5L)
    }
    assert(e.getMessage.contains("MaxExactPairRows"))
    assert(e.getMessage.contains("semDedup"))
    // at-cap passes, and maxRows <= 0 is the explicit unbounded opt-in
    assert(Similarity.cosinePairsExact(six, -1.0, maxRows = 6L)
      .count() === 15L)
    assert(Similarity.cosinePairsExact(six, -1.0, maxRows = 0L)
      .count() === 15L)
  }

  test("linkByBlocking rejects overlapping or malformed spans (recall guard)") {
    // Overlapping spans silently void the pigeonhole recall guarantee —
    // one edit can break BOTH passes — so a misconfigured caller must
    // fail fast instead of losing matches.
    val recs = Seq((1L, 1L, "abcdef")).toDF("rid", "g", "nm")
    val eOverlap = intercept[IllegalArgumentException] {
      graft.operators.RecordLinkage.linkByBlocking(
        recs, "rid", "g", "nm", Seq((1, 3), (2, 3)), 1)
    }
    assert(eOverlap.getMessage.contains("overlap"))
    intercept[IllegalArgumentException] { // 0-based start
      graft.operators.RecordLinkage.linkByBlocking(
        recs, "rid", "g", "nm", Seq((0, 2), (3, 2)), 1)
    }
    intercept[IllegalArgumentException] { // non-positive length
      graft.operators.RecordLinkage.linkByBlocking(
        recs, "rid", "g", "nm", Seq((1, 0), (3, 2)), 1)
    }
    // adjacent-but-disjoint spans stay accepted (s1 + l1 == s2)
    assert(graft.operators.RecordLinkage.linkByBlocking(
      recs, "rid", "g", "nm", Seq((1, 2), (3, 2)), 1).count() === 0L)
  }

  test("psiMonitor rejects a reference with duplicate bucket_hi rows") {
    // A duplicate bucket would otherwise surface as DUPLICATE_MAP_KEY at
    // runtime, far from the cause; the monitor validates at plan build.
    import graft.streaming.{Streams, ValSeen}
    val dupRef = Seq((16L, 5L), (16L, 7L), (32L, 3L)).toDF("bucket_hi", "r")
    val vals = Seq.empty[ValSeen].toDS()
    val e = intercept[IllegalArgumentException] {
      Streams.psiMonitor(vals, dupRef)
    }
    assert(e.getMessage.contains("duplicate bucket_hi"))
  }

  test("round-11 operators accept empty / degenerate inputs and guard params") {
    import graft.operators.Clusters
    // boundedKcore: empty edges -> empty; k larger than any degree peels
    // everything in round 1 with core_deg 0
    val emptyE = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Clusters.boundedKcore(emptyE, "i", "j", 3, 4).count() === 0L)
    val path2 = Seq((1L, 2L), (2L, 1L)).toDF("i", "j")
    val peeled = Clusters.boundedKcore(path2, "i", "j", k = 5, rounds = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(peeled === Set((1L, 1L, 1L, 0L), (2L, 1L, 1L, 0L)))
    intercept[IllegalArgumentException] {
      Clusters.boundedKcore(path2, "i", "j", k = 0, rounds = 2)
    }
    intercept[IllegalArgumentException] {
      Clusters.boundedKcore(path2, "i", "j", k = 3, rounds = 0)
    }
    // sessionizeEventTime: a non-positive gap must fail at build time
    intercept[IllegalArgumentException] {
      graft.streaming.Streams.sessionizeEventTime(
        spark.emptyDataset[graft.streaming.Tick], gapMs = 0L)
    }
  }

  test("round-11 statistical queries accept empty / degenerate table inputs") {
    // The r11 wave is defined straight over the Tables loaders, so the
    // degenerate cases get a degenerate SF DIR: tiny parquet tables with
    // exactly the shapes the verdict called out — corpus smaller than
    // Hill's k+1, fewer than 10 Lorenz customers, an empty Q-Q segment,
    // all-tie Cliff's groups, a doc shorter than one span-mask window,
    // and a language with zero predictions.
    val dir = java.nio.file.Files.createTempDirectory("edge_sf").toString
    Seq((1L, "abcdef", 6L, "en"),                       // shorter than L=12
        (2L, "the of and to a in is it you that was", 39L, "zz"), // no zz profile
        (3L, "exactly12chr", 12L, "en"))                // one full window
      .toDF("doc_id", "text", "n_chars", "lang")
      .write.parquet(s"$dir/documents.parquet")
    Seq((1L, 1L, 100.0), (2L, 2L, 250.0), (3L, 3L, 400.0)) // 3 custs < 10
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, "MACHINERY"), (2L, "MACHINERY"), (3L, "MACHINERY")) // no BUILDING
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq(("view", 5.0), ("view", 5.0), ("click", 5.0), ("click", 5.0))
      .toDF("event_type", "value")                      // all-tie samples
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
      .write.parquet(s"$dir/events.parquet")

    // hill tail: 3 docs < k+1=101 — the (k+1)-th order statistic does not
    // exist, so the estimator row is honestly null, never a throw
    val ht = graft.queries.StatOps.qHillTail(spark, dir).collect()
    assert(ht.length === 1 && ht(0).isNullAt(1) && ht(0).isNullAt(4))
    // lorenz: 3 customers spread over tied type-1 boundaries — deciles
    // partition all customers and the cumulative share still ends at 1000
    val lz = graft.queries.Aggregations.qLorenz(spark, dir).collect()
    assert(lz.map(_.getAs[Long]("n_cust")).sum === 3L)
    assert(lz.last.getAs[Long]("cum_share_permille") === 1000L)
    assert(lz.map(_.getAs[Long]("decile")).toSeq === Seq(1L, 4L, 7L))
    // qq drift: the BUILDING segment is EMPTY — all 9 decile rows emit
    // with null building-side stats instead of vanishing or throwing
    val qq = graft.queries.DriftOps.qQqDrift(spark, dir).collect()
    assert(qq.length === 9)
    assert(qq.forall(r => r.isNullAt(1) && r.isNullAt(3) && r.isNullAt(4)))
    assert(qq.forall(!_.isNullAt(2)))
    // cliffs delta: both samples all-tie at one value — u2 = n1·n2
    // exactly, delta 0, magnitude negligible (ties as halves)
    val cd = graft.queries.StatOps.qCliffsDelta(spark, dir).collect()
    assert(cd.length === 1)
    assert(cd(0).getAs[Double]("delta") === 0.0)
    assert(cd(0).getAs[String]("magnitude") === "negligible")
    // span mask: the 6-char doc is shorter than one 12-char span and
    // must drop out; the exactly-12-char doc masks its whole window
    val sm = graft.queries.TrainOps.qSpanMask(spark, dir).collect()
    assert(sm.map(_.getAs[Long]("doc_id")).toSet === Set(2L, 3L))
    assert(sm.filter(_.getAs[Long]("doc_id") == 3L)
      .map(_.getAs[String]("masked_span")).toSeq === Seq("exactly12chr"))
    // lang confusion: truth 'zz' has no langId profile, so it is never
    // predicted — precision and f1 are NULL (not 0, not a throw),
    // recall is an honest 0
    val lcRows = graft.queries.LlmOps.qLangConfusion(spark, dir).collect()
    val zz = lcRows.filter(_.getAs[String]("lang") == "zz")
    assert(zz.length === 1)
    assert(zz(0).isNullAt(zz(0).fieldIndex("precision_permille")))
    assert(zz(0).isNullAt(zz(0).fieldIndex("f1_permille")))
    assert(zz(0).getAs[Long]("recall_permille") === 0L)
  }

  test("round-12 queries accept degenerate table inputs") {
    // the same degenerate-SF-dir treatment the r10/r11 waves got, applied
    // in the SAME round the operators land
    val dir = java.nio.file.Files.createTempDirectory("edge12_sf").toString
    // every customer's last order sits at the horizon -> zero churners
    Seq((1L, java.sql.Timestamp.valueOf("1998-08-01 00:00:00"), 100.0),
        (2L, java.sql.Timestamp.valueOf("1998-08-01 00:00:00"), 200.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    // single-user single-event stream -> no transitions at all
    Seq((7L, "view", 1.0))
      .toDF("user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
      .withColumn("event_id", lit(1L))
      .write.parquet(s"$dir/events.parquet")
    // two docs with zero shared shingles -> no banded candidates
    Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "one two three four five six"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")

    // kaplan-meier: everyone censored -> NO churn tenures, empty curve
    // (not a throw, not a fabricated S=1000 row)
    assert(graft.queries.CorpusOps.qKaplanMeier(spark, dir).count() === 0L)
    // markov stationary: an empty transition matrix -> empty vector
    assert(graft.queries.CorpusOps.qMarkovStationary(spark, dir)
      .count() === 0L)
    // minhash estimator audit: no candidate pairs -> empty audit
    assert(graft.queries.TrainOps.qMinhashEst(spark, dir).count() === 0L)
    // ttr: both docs keep rows; the 5/6-token docs are shorter than one
    // 10-token MATTR window -> null mattr, live ttr
    val tt = graft.queries.LlmOps.qTtr(spark, dir).collect()
    assert(tt.length === 2)
    assert(tt.forall(_.isNullAt(tt(0).fieldIndex("mattr_permille"))))
    assert(tt.forall(_.getAs[Long]("ttr_permille") === 1000L))
  }

  test("round-13 queries accept degenerate table inputs") {
    val dir = java.nio.file.Files.createTempDirectory("edge13_sf").toString
    // one single-line group and one two-line group: every percentile of a
    // 1-element multiset is that element; a 2-element IQR spans the pair
    Seq((1L, 1, "A", 100.0), (2L, 1, "B", 50.0), (3L, 1, "B", 150.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    // a constant dimension (mx == mn) and a two-level dimension
    Seq((1L, Seq(0.5f, 0.0f), 0), (2L, Seq(0.5f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    // a deterministic a->b->a->b chain: every transition certain
    Seq((7L, 1L, "a", java.sql.Timestamp.valueOf("2026-01-01 00:00:01")),
        (7L, 2L, "b", java.sql.Timestamp.valueOf("2026-01-01 00:00:02")),
        (7L, 3L, "a", java.sql.Timestamp.valueOf("2026-01-01 00:00:03")),
        (7L, 4L, "b", java.sql.Timestamp.valueOf("2026-01-01 00:00:04")))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    // quantile grid: group A (n=1) answers 100_00 cents at EVERY p;
    // group B (n=2) switches value at the ceil boundary pos 1 -> 2
    val qg = graft.queries.StatOps.qQuantileGrid(spark, dir).collect()
    assert(qg.length === 14)
    assert(qg.filter(_.getAs[String]("flag") == "A")
      .forall(_.getAs[Long]("value_cents") === 10000L))
    val bVals = qg.filter(_.getAs[String]("flag") == "B")
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("value_cents")).toMap
    assert(bVals(1L) === 5000L && bVals(50L) === 5000L &&
      bVals(75L) === 15000L && bVals(99L) === 15000L)
    // IQR fences: n=1 -> iqr 0, fences collapse to the point, 0 outliers;
    // n=2 -> p25 = p75 never flags its own quartile points
    val iq = graft.queries.StatOps.qIqrFences(spark, dir).collect()
    assert(iq.length === 2)
    assert(iq.forall(r => r.getAs[Long]("n_below") === 0L &&
      r.getAs[Long]("n_above") === 0L &&
      r.getAs[Long]("outlier_permille") === 0L))
    // SQ8 error: a constant dimension dequantizes to mn exactly (err 0);
    // endpoints of a spanned dimension are exact too (levels 0 and 255)
    val sq = graft.queries.TrainOps.qEmbSq8Err(spark, dir).collect()
    assert(sq.length === 2)
    assert(sq.forall(_.getAs[Long]("max_err_micro") === 0L))
    assert(sq.filter(_.getAs[Long]("i") == 0L)
      .head.getAs[Long]("range_micro") === 0L)
    // markov entropy: a deterministic chain has zero entropy rate — all
    // probabilities are 1, every row entropy and contribution exactly 0
    val mh = graft.queries.CorpusOps.qMarkovEntropy(spark, dir).collect()
    assert(mh.length === 2)
    assert(mh.forall(r => r.getAs[Long]("h_row_micro") === 0L &&
      r.getAs[Long]("contrib_micro") === 0L))
    assert(mh.map(_.getAs[Long]("stationary_micro")).sum >= 999998L)
    // vocab coverage: a 2-type corpus saturates every K — vocab_used
    // honestly reports the 2 available types, coverage is exactly 1000
    Seq((1L, "x y x")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val vc = graft.queries.StatOps.qVocabCoverage(spark, dir).collect()
    assert(vc.length === 4)
    assert(vc.forall(r => r.getAs[Long]("vocab_used") === 2L &&
      r.getAs[Long]("covered_tokens") === 3L &&
      r.getAs[Long]("coverage_permille") === 1000L))
    // token gini on the same 2-type corpus: counts (1, 2) ascending,
    // S = 1·1 + 2·2 = 5, G = (2·5 − 3·3)/(2·3) = 1/6 → 166 permille
    val tg = graft.queries.StatOps.qTokenGini(spark, dir).collect()
    assert(tg.length === 1)
    assert(tg(0).getAs[Long]("n_types") === 2L &&
      tg(0).getAs[Long]("total_tokens") === 3L &&
      tg(0).getAs[Long]("gini_permille") === 166L)
    // gap quantiles on the deterministic 1-second chain: type a has one
    // gap, type b two — every percentile of both is exactly 1e6 µs
    val gq = graft.queries.StatOps.qGapQuantiles(spark, dir).collect()
    assert(gq.length === 6)
    assert(gq.forall(_.getAs[Long]("gap_quantile_us") === 1000000L))
    assert(gq.filter(_.getAs[String]("event_type") == "b")
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("pos")).toMap ===
      Map(50L -> 1L, 90L -> 2L, 99L -> 2L))
  }

  test("r14 additions: degenerate corpora give absent groups, never throws") {
    val dir = java.nio.file.Files.createTempDirectory("edge14_sf").toString
    // src_short's only doc has ONE token: its 2/3-gram groups must be
    // ABSENT (a zero-total group would divide by zero — absence is the
    // contract); lang "xx" has only length-<=1 texts → no bigram row;
    // the empty-string doc contributes one empty TOKEN (split semantics,
    // identical in DuckDB) but zero shingles and zero char bigrams
    Seq(
      (1L, "a b c a b c", "en", "src"),
      (2L, "word", "xx", "src_short"),
      (3L, "", "xx", "src_short"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

    val dn = graft.queries.StatOps.qDistinctNgrams(spark, dir).collect()
    // src: n=1 {a,b,c}/6; n=2 {a b, b c, c a}/5; n=3 {a b c, b c a, c a b}/4
    assert(dn.filter(_.getAs[String]("source") == "src").map(r =>
      r.getAs[Int]("n") -> ((r.getAs[Long]("distinct_ngrams"),
        r.getAs[Long]("total_ngrams")))).toMap ===
      Map(1 -> ((3L, 6L)), 2 -> ((3L, 5L)), 3 -> ((3L, 4L))))
    // src_short: unigram group exists ("word" + the empty token), the
    // pair-less 2/3-gram groups are absent
    assert(dn.filter(r => r.getAs[String]("source") == "src_short")
      .map(_.getAs[Int]("n")).toSeq === Seq(1))
    val er = graft.queries.StatOps.qEntropyRate(spark, dir).collect()
    // en: 11 chars -> 10 bigrams; xx: "word" -> 3, "" -> 0
    assert(er.map(r => r.getAs[String]("lang") ->
      r.getAs[Long]("n_bigrams")).toMap === Map("en" -> 10L, "xx" -> 3L))
    // "word"'s three bigrams are all unique (every prefix total equals
    // its bigram count) -> conditional entropy exactly 0
    assert(er.filter(_.getAs[String]("lang") == "xx")
      .head.getAs[Long]("cond_entropy_micro") === 0L)
    val ov = graft.queries.StatOps.qOovRate(spark, dir).collect()
    // all of en's types repeat twice (freq 2 < 3 -> all rare); xx has
    // "word" (freq 1) and "" (freq 1) -> everything rare too
    assert(ov.map(r => r.getAs[String]("lang") ->
      r.getAs[Long]("rare_token_permille")).toMap ===
      Map("en" -> 1000L, "xx" -> 1000L))
    // and a fully EMPTY corpus: all three return zero rows, no throw
    val empty = java.nio.file.Files.createTempDirectory("edge14_empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$empty/documents.parquet")
    assert(graft.queries.StatOps.qDistinctNgrams(spark, empty).count() === 0L)
    assert(graft.queries.StatOps.qEntropyRate(spark, empty).count() === 0L)
    assert(graft.queries.StatOps.qOovRate(spark, empty).count() === 0L)
  }
}
