package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Layout, LmScore, Ranking}

/** Fixture-level checks for the round-4 pipeline additions: unigram-LM
  * scoring against hand-computed expectations, TF-IDF ranking on a known
  * tiny corpus, incremental dedup survivor logic, and the Z-order box
  * property (the geometric fact the layout's pruning rests on). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("unigram cross-entropy matches the hand-computed distribution") {
    // corpus: "a a b" + "c"  →  counts a:2 b:1 c:1, total 4
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = LmScore.unigramCrossEntropy(docs, "text", "doc_id", 1000)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "nll_micro", "ce_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    def u(p: Double): Long = math.round(-math.log(p) * 1e6)
    val d1 = 2 * u(2.0 / 4) + u(1.0 / 4)
    val d2 = u(1.0 / 4)
    assert(out === Seq((1L, 3L, 0L, d1, d1 / 3), (2L, 1L, 0L, d2, d2)))
  }

  test("unigram OOV tokens get the 1/total floor") {
    // vocabSize=1 keeps only 'a' (count desc, token asc): b and c are OOV
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = LmScore.unigramCrossEntropy(docs, "text", "doc_id", 1)
      .orderBy("doc_id")
      .select("doc_id", "n_oov", "nll_micro")
      .as[(Long, Long, Long)].collect().toSeq
    def u(p: Double): Long = math.round(-math.log(p) * 1e6)
    // OOV floor = 1/total = 1/4
    assert(out === Seq(
      (1L, 1L, 2 * u(2.0 / 4) + u(1.0 / 4)),
      (2L, 1L, u(1.0 / 4))))
  }

  test("tfidf top terms rank by tf*idf with term tie-break") {
    // 'x' appears in all 3 docs (idf = ln(1) = 0); 'y' only in doc 1;
    // 'z' in docs 2 and 3
    val docs = Seq((1L, "x y y"), (2L, "x z"), (3L, "x z z z"))
      .toDF("doc_id", "text")
    val out = Ranking.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .select("doc_id", "tok", "rk")
      .orderBy("doc_id", "rk") // the operator no longer sorts its output
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "y", 1L), (1L, "x", 2L),   // y: 2*ln(3) beats x: 0
      (2L, "z", 1L), (2L, "x", 2L),   // z: 1*ln(1.5) beats x: 0
      (3L, "z", 1L), (3L, "x", 2L)))  // z: 3*ln(1.5)
  }

  test("incremental dedup keeps only novel batch content") {
    val store = Seq((10L, "seen before"), (11L, "also seen"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, "seen before"),   // dropped: in store
      (21L, "brand new"),     // kept
      (22L, "brand new"),     // dropped: within-batch dup of 21
      (23L, "another new"))   // kept
      .toDF("doc_id", "text")
    val out = Dedup.incremental(batch, store, "text", "doc_id")
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(out === Seq(21L, 23L))
    // idempotent: re-running with the survivors appended to the store
    // eliminates the whole batch
    val again = Dedup.incremental(batch,
      store.unionByName(batch.filter(col("doc_id").isin(21L, 23L))),
      "text", "doc_id")
    assert(again.count() === 0)
  }

  test("chunkOverlap covers every token with the declared overlap") {
    import graft.operators.Packing
    val docs = Seq((1L, 3L), (2L, 128L), (3L, 129L), (4L, 300L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.chunkOverlap(docs, "doc_id", "n_tokens",
        size = 128, stride = 32)
      .select("doc_id", "chunk_idx", "start_tok", "end_tok")
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // short doc and exact-size doc: one chunk each
    assert(out.filter(_._1 == 1L) === Seq((1L, 0L, 0L, 3L)))
    assert(out.filter(_._1 == 2L) === Seq((2L, 0L, 0L, 128L)))
    // 129 tokens: second chunk reaches the end
    assert(out.filter(_._1 == 3L) ===
      Seq((3L, 0L, 0L, 128L), (3L, 1L, 32L, 129L)))
    // 300 tokens: starts every 32 up to ceil(172/32)*32 = 192
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(_._3) === (0L to 192L by 32L))
    assert(d4.last._4 === 300L)
    // gap-free coverage: each next start <= previous end
    d4.sliding(2).foreach { case Seq(a, b) => assert(b._3 <= a._4) }
  }

  test("shardManifest: fluid-fill shards by global token order, fingerprints recompute") {
    import graft.operators.Packing
    // sparse ids across several buckets, budget 10, uniform 4-token docs:
    // starts 0,4,8,12,16,20,24 → shards 0,0,0,1,1,2,2
    val ids = Seq(0L, 1L, 2L, 5L, 6L, 9L, 12L)
    val docs = ids.map(i => (i, 4L)).toDF("doc_id", "n_tokens")
    val out = Packing.shardManifest(docs, "doc_id", "n_tokens",
        budget = 10L, bucketWidth = 3L)
      .orderBy("shard_id")
      .select("shard_id", "n_docs", "total_tokens", "first_id", "last_id",
        "fingerprint")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    def fp(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:4".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val want = Seq(
      (0L, 3L, 12L, 0L, 2L, fp(0) + fp(1) + fp(2)),
      (1L, 2L, 8L, 5L, 6L, fp(5) + fp(6)),
      (2L, 2L, 8L, 9L, 12L, fp(9) + fp(12)))
    assert(out === want)
    // id ranges tile the corpus in order: no shard overlaps its successor
    out.sliding(2).foreach { case Seq(a, b) => assert(a._5 < b._4) }
  }

  test("chunkOverlap treats null and zero token counts as empty docs") {
    import graft.operators.Packing
    val docs = Seq((1L, Some(0L)), (2L, None), (3L, Some(40L)))
      .toDF("doc_id", "n_tokens")
    val out = Packing.chunkOverlap(docs, "doc_id", "n_tokens",
        size = 128, stride = 32)
      .select("doc_id", "chunk_idx", "start_tok", "end_tok", "n_chunk_tokens")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // no phantom 128-token chunks: empty/unknown docs yield one empty chunk
    assert(out === Seq((1L, 0L, 0L, 0L, 0L), (2L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 40L, 40L)))
  }

  test("nfc normalization unifies composed and decomposed unicode") {
    import graft.functions.{TextFunctions => T}
    val docs = Seq(
      (1L, "café"),            // composed é
      (2L, "café"),           // decomposed e + combining acute
      (3L, "  CAFÉ   latte "), // case + whitespace noise
      (4L, "plain ascii"),
      (5L, "\tplain\nascii  "))    // tabs/newlines must not leave residue
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        T.normalizeText(col("text")).as("norm"),
        md5(T.normalizeText(col("text"))).as("h"))
      .orderBy("doc_id").as[(Long, String, String)].collect()
    // composed == decomposed after NFC; digest-keyed dedup now sees them
    // as the same content
    assert(out(0)._2 === out(1)._2 && out(0)._3 === out(1)._3)
    assert(out(2)._2 === "café latte")
    assert(out(3)._2 === "plain ascii")
    // collapse runs BEFORE trim: a leading tab can't survive as a space
    assert(out(4)._2 === "plain ascii" && out(4)._3 === out(3)._3)
    // the SQL registration works and agrees with the column API
    docs.createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(text) AS n FROM nfc_docs ORDER BY doc_id")
      .as[String].collect()
    assert(viaSql(0) === viaSql(1))
  }

  test("zorderValue interleaves bits exactly") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }.sum
    val df = spark.range(0, 500)
      .select(pmod(col("id") * 2654435761L, lit(1024)).as("a"),
        pmod(col("id") * 40503L, lit(1024)).as("b"))
    val got = df.withColumn("z", Layout.zorderValue(col("a"), col("b"), 10))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === ref(a, b, 10), s"($a,$b)") }
  }

  test("z-prefix groups cover tight boxes on both dimensions") {
    // THE pruning property: rows sharing a 6-bit z-prefix sit inside one
    // 128x128 box of the 1024x1024 bin plane
    val df = spark.range(0, 20000)
      .select(pmod(col("id") * 2654435761L, lit(1024)).as("a"),
        pmod(col("id") * 40503L, lit(1024)).as("b"))
      .withColumn("z", Layout.zorderValue(col("a"), col("b"), 10))
    val spans = df.groupBy(shiftright(col("z"), 14).as("zfile"))
      .agg((max("a") - min("a")).as("aspan"),
        (max("b") - min("b")).as("bspan"))
      .agg(max("aspan"), max("bspan"))
      .as[(Long, Long)].head()
    assert(spans._1 < 128 && spans._2 < 128, spans)
  }

  test("writeZOrdered clusters both dimensions; a plain write does not") {
    val dir = graft.operators.Scratch.dir("zorder")
    val df = spark.range(0, 20000)
      .select(col("id"),
        pmod(col("id") * 2654435761L, lit(1024)).as("a"),
        pmod(col("id") * 40503L, lit(1024)).as("b"))
    val z = Layout.zorderValue(col("a"), col("b"), 10)
    Layout.writeZOrdered(df, s"$dir/z", z, files = 16)
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/plain")
    def meanSpan(path: String): (Double, Double) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("a") - min("a")).cast("double").as("aspan"),
          (max("b") - min("b")).cast("double").as("bspan"))
        .agg(avg("aspan"), avg("bspan")).as[(Double, Double)].head()
    val (za, zb) = meanSpan(s"$dir/z")
    val (pa, pb) = meanSpan(s"$dir/plain")
    // 16 range-partitioned files over a 20-bit z-space: each file is ~4
    // z-prefix boxes -> mean spans far below the hash layout's full range
    assert(za < pa / 2 && zb < pb / 2, s"z=($za,$zb) plain=($pa,$pb)")
    assert(spark.read.parquet(s"$dir/z").count() === df.count())
    // the data itself is unchanged (content equality, ignoring order)
    assert(spark.read.parquet(s"$dir/z").agg(sum("a"), sum("b"))
      .as[(Long, Long)].head() ===
      df.agg(sum("a"), sum("b")).as[(Long, Long)].head())
  }
}
