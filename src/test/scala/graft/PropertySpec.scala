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
}
