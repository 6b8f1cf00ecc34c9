package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized property checks for the operators whose value IS a
  * guarantee: the winnowing recall bound, URL-canonicalization idempotence,
  * partial-aggregate merge equivalence, and PageRank mass invariants. A
  * fixed seed keeps every run identical (no flaky CI), while the random
  * structure covers shapes no hand-written fixture would. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // one Random PER TEST (fresh stream each call): a single shared stream
  // would make each test's inputs depend on suite execution order, so a
  // failure seen under `testOnly -z` would not reproduce in a full run
  private def freshRandom(testIndex: Int) = new Random(20260813L + testIndex)

  private def randTokens(rnd: Random, n: Int,
      vocab: IndexedSeq[String]): Seq[String] =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))

  test("PROPERTY winnow: every shared w+k-1 run yields a shared fingerprint (20 random corpora)") {
    val rnd = freshRandom(1)
    val (k, w) = (3, 4)
    for (caseIdx <- 1 to 20) {
      val vocab = IndexedSeq.tabulate(40)(i => s"t${caseIdx}_$i")
      // shared run strictly longer than the guarantee bound
      val runLen = w + k - 1 + rnd.nextInt(6)
      val shared = randTokens(rnd, runLen, vocab).mkString(" ")
      val d1 = (randTokens(rnd, rnd.nextInt(12), vocab) :+ shared) ++
        randTokens(rnd, rnd.nextInt(12), vocab)
      val d2 = (randTokens(rnd, rnd.nextInt(12), vocab) :+ shared) ++
        randTokens(rnd, rnd.nextInt(12), vocab)
      val df = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
        .toDF("doc_id", "text")
      val fps = graft.operators.Winnow.fingerprints(df, "text", "doc_id", k, w)
        .collect().groupBy(_.getLong(0))
        .map { case (d, rs) => d -> rs.map(_.getString(2)).toSet }
      assert((fps(1L) intersect fps(2L)).nonEmpty,
        s"case $caseIdx: no shared fingerprint despite a $runLen-token run")
    }
  }

  test("PROPERTY url canonicalize is idempotent over random noisy urls") {
    val rnd = freshRandom(2)
    val hosts = Seq("A.Example.COM", "b.example.com", "WWW.C.EX.io")
    val urls = (1 to 60).map { _ =>
      val scheme = if (rnd.nextBoolean()) "https://" else "HTTPS://"
      val port = if (rnd.nextBoolean()) ":443" else ""
      val path = "/" + Seq.fill(rnd.nextInt(3))("p" + rnd.nextInt(9)).mkString("/")
      val slash = if (rnd.nextBoolean()) "/" else ""
      val params = rnd.shuffle(Seq("a=1", "b=2", "utm_x=9", "ref=s")
        .take(rnd.nextInt(5))).mkString("&")
      val q = if (params.nonEmpty) "?" + params else ""
      val frag = if (rnd.nextBoolean()) "#sec" else ""
      scheme + hosts(rnd.nextInt(hosts.size)) + port + path + slash + q + frag
    } :+ "http://passthrough.example.com/x" :+ "garbage ¯\\_(ツ)_/¯"
    val df = urls.toDF("url")
    val once = df.select(graft.operators.UrlOps.canonicalize(col("url")))
      .as[String].collect()
    val twice = df.select(graft.operators.UrlOps.canonicalize(
      graft.operators.UrlOps.canonicalize(col("url")))).as[String].collect()
    assert(once.toSeq === twice.toSeq)
    // canonical https urls carry no tracking params, ports, or fragments
    once.filter(_.startsWith("https://")).foreach { u =>
      assert(!u.contains("utm_") && !u.contains("ref=") &&
        !u.contains(":443") && !u.contains("#"), u)
    }
  }

  test("PROPERTY merged partials equal the from-scratch aggregate (10 random splits)") {
    val rnd = freshRandom(3)
    import graft.operators.Layout
    for (caseIdx <- 1 to 10) {
      val rows = Seq.fill(60 + rnd.nextInt(60))(
        (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong))
      val df = rows.toDF("k", "v")
      val cut = rnd.nextInt(rows.size)
      val (b, d) = (rows.take(cut), rows.drop(cut))
      val merged = Layout.mergePartialAggs(
        Layout.partialAgg(b.toDF("k", "v"), Seq("k"), "v"),
        Layout.partialAgg(d.toDF("k", "v"), Seq("k"), "v"), Seq("k"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val direct = df.groupBy("k")
        .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(merged === direct, s"case $caseIdx (cut=$cut)")
    }
  }

  test("PROPERTY pagerank: teleport floor and mass bound hold on random graphs") {
    val rnd = freshRandom(4)
    import graft.operators.Clusters
    for (caseIdx <- 1 to 8) {
      val n = 4 + rnd.nextInt(5)
      val edges = (1 to n * 2).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}", 1L + rnd.nextInt(9)))
        .filter { case (a, b, _) => a != b }
      if (edges.nonEmpty) {
        val r = Clusters.pageRankWeighted(edges.toDF("src", "dst", "w"),
          "src", "dst", "w", iterations = 5)
          .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(r.keySet === nodes, s"case $caseIdx")
        // teleport floor; total mass can only shrink (dangling drop + floor)
        assert(r.values.forall(_ >= 150000L), s"case $caseIdx: $r")
        assert(r.values.sum <= nodes.size * 1000000L + nodes.size,
          s"case $caseIdx: mass grew: $r")
      }
    }
  }

  test("PROPERTY bpe: distributed merges match an independent reference trainer (8 random corpora)") {
    val rnd = freshRandom(5)
    // Reference Sennrich BPE over a word-frequency map, written against
    // the algorithm (symbol lists, per-word pair scans), NOT the engine's
    // single-char-replace representation — a genuinely independent path.
    def refBpe(freqs: Map[String, Long], n: Int): Seq[(String, Long)] = {
      var vocab = freqs.map { case (w, f) => (w.map(_.toString).toList, f) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      // The TIE-BREAK is part of the engine's contract: pairs compare as
      // 2-char strings in the single-char symbol space (merge r's symbol
      // is U+4E00+r). The reference emulates that ORDER (chr assignment
      // below) but applies merges through an independent list-based scan —
      // the mechanics under test never touch the replace representation.
      val chrOf = scala.collection.mutable.Map.empty[String, Char]
      def key(s: String): Char = chrOf.getOrElse(s, s.charAt(0))
      var r = 0
      var done = false
      while (r < n && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- vocab; p <- syms.zip(syms.tail))
          counts(p) = counts.getOrElse(p, 0L) + f
        if (counts.isEmpty) done = true
        else {
          val best = counts.toSeq
            .minBy { case ((a, b), c) => (-c, key(a), key(b)) }
          chrOf(best._1._1 + best._1._2) = (0x4E00 + r).toChar
          out += ((best._1._1 + best._1._2, best._2))
          vocab = vocab.map { case (syms, f) =>
            val merged = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == best._1._1 &&
                syms(i + 1) == best._1._2) {
                merged += best._1._1 + best._1._2; i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.toList, f)
          }
        }
        r += 1
      }
      out.toSeq
    }
    for (caseIdx <- 1 to 8) {
      val words = IndexedSeq("spark", "table", "scan", "join", "agg", "row")
      val docs = (1 to 6).map(_ => randTokens(rnd, 4 + rnd.nextInt(12),
        words).mkString(" ")).toDF("text")
      val nMerges = 1 + rnd.nextInt(5)
      val engine = graft.operators.Bpe.train(docs, "text", nMerges)
        .orderBy("merge_rank").collect()
        .map(x => (x.getString(1), x.getLong(2))).toSeq
      val freqs = docs.collect().flatMap(_.getString(0).split(" "))
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      assert(engine === refBpe(freqs, nMerges), s"case $caseIdx")
    }
  }

  test("PROPERTY boilerplate: matches an independent per-source line filter (10 random corpora)") {
    val rnd = freshRandom(6)
    for (caseIdx <- 1 to 10) {
      val nDocs = 3 + rnd.nextInt(8)
      val docs = (1 to nDocs).map { i =>
        // small line vocabulary forces real cross-doc repeats
        val lines = (0 to rnd.nextInt(5)).map(_ => s"line${rnd.nextInt(4)}")
        (i.toLong, s"s${rnd.nextInt(2)}", lines.mkString("\n"))
      }
      val minDf = 2 + rnd.nextInt(2)
      val out = graft.operators.Boilerplate
        .strip(docs.toDF("doc_id", "source", "text"),
          "text", "doc_id", "source", minDf)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))
      // independent reference: Scala collections, per-source df over
      // DISTINCT docs, position-preserving filter
      val df = docs.groupBy(_._2).map { case (src, ds) =>
        src -> ds.flatMap(d => d._3.split("\n", -1).distinct.map(l => (d._1, l)))
          .groupBy(_._2).map { case (l, xs) => l -> xs.map(_._1).distinct.size }
      }
      val expect = docs.map { case (id, src, text) =>
        val lines = text.split("\n", -1).toSeq
        val kept = lines.filter(l => df(src)(l) < minDf)
        (id, lines.size.toLong,
          if (kept.isEmpty) -1L else kept.size.toLong,
          if (kept.isEmpty) null
          else java.security.MessageDigest.getInstance("MD5")
            .digest(kept.mkString("\n").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
      }.sortBy(_._1)
      assert(out.toSeq === expect, s"case $caseIdx")
    }
  }

  test("PROPERTY hammingPairs equals brute force over random signatures (12 random cases)") {
    // The pigeonhole claim is a THEOREM about the banding, so test it
    // like one: for random widths, thresholds, and signature sets
    // (including duplicate and high-bit-noise signatures), the banded
    // candidates + verify must equal the exact all-pairs answer — no
    // missed pair (recall) and no extra pair (verify) on any draw.
    val rnd = freshRandom(6)
    for (caseIdx <- 1 to 12) {
      val bits = 4 + rnd.nextInt(16)             // 4..19
      val maxH = rnd.nextInt(math.min(bits, 4))  // 0..min(bits,4)-1
      val n = 8 + rnd.nextInt(40)
      val mask = (1L << bits) - 1L
      val sigsRaw = (0L until n).map { id =>
        // sprinkle noise ABOVE the declared width: must be masked off
        val noise = if (rnd.nextBoolean()) rnd.nextLong() & ~mask else 0L
        (id, (rnd.nextLong() & mask) | noise)
      }
      val found = graft.operators.Dedup.hammingPairs(
          sigsRaw.toDF("id", "sig"), "id", "sig", bits, maxH)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val masked = sigsRaw.map { case (id, s) => id -> (s & mask) }.toMap
      val exact = (for {
        a <- 0L until n; b <- (a + 1) until n
        if java.lang.Long.bitCount(masked(a) ^ masked(b)) <= maxH
      } yield (a, b)).toSet
      assert(found === exact,
        s"case $caseIdx bits=$bits maxH=$maxH n=$n: " +
          s"missed=${(exact diff found).take(3)} extra=${(found diff exact).take(3)}")
    }
  }

  test("PROPERTY two-phase rank equals the naive window for random buckets (8 random cases)") {
    // The Ranks contract is an identity — offset + in-bucket rank must
    // equal the whole-group rank for ANY monotone bucketing — so test it
    // like one: random group counts, random skewed value ranges, random
    // bucket widths (including a width coarser than the whole domain and
    // width 1 = one bucket per distinct value), heavy ties.
    val rnd = freshRandom(7)
    for (caseIdx <- 1 to 8) {
      val nGroups = 1 + rnd.nextInt(4)
      val n = 50 + rnd.nextInt(300)
      val vRange = 1 + rnd.nextInt(40) // heavy ties when small
      val width = 1 + rnd.nextInt(60)  // may exceed the whole domain
      val rows = (0L until n).map { id =>
        (id, s"g${rnd.nextInt(nGroups)}", rnd.nextInt(vRange).toLong)
      }
      val df = rows.toDF("id", "g", "v").localCheckpoint(eager = true)
      val naive = df.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("g").orderBy("v", "id")))
        .select(col("id"), col("rn").cast("long").as("rn"))
        .as[(Long, Long)].collect().toMap
      val two = graft.operators.Ranks.rowNumber(df, Seq("g"),
          expr(s"v div $width"), Seq(col("v"), col("id")), "rn")
        .select(col("id"), col("rn").cast("long").as("rn"))
        .as[(Long, Long)].collect().toMap
      assert(two === naive,
        s"case $caseIdx groups=$nGroups n=$n vRange=$vRange width=$width")
    }
  }
}
