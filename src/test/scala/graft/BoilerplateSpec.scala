package graft

import org.apache.spark.sql.Row
import graft.operators.Boilerplate
import graft.queries.CurateOps

/** Line-level boilerplate strip (Boilerplate.scala): exact fixture
  * semantics, per-source scoping, the all-boilerplate edge, and the
  * registered q_boilerplate query. */
class BoilerplateSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("strips df>=minDf lines per source, keeps unique prose in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "nav\nunique one\nfooter"),
      (2L, "s", "nav\nunique two\nfooter"),
      (3L, "s", "nav\nunique three\nfooter"),
      (4L, "t", "nav\nother\nfooter"), // same lines, different source: df=1
      (5L, "s", "nav\nfooter"))        // all boilerplate once df counts land
      .toDF("doc_id", "source", "text")
    val out = Boilerplate.strip(docs, "text", "doc_id", "source", minDf = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 2L)))
    // Source s: nav/footer appear in 4 docs (df >= 3) -> stripped.
    assert(out(0).getLong(2) == 1L &&
      out(0).getString(3) == md5hex("unique one"))
    assert(out(1).getString(3) == md5hex("unique two"))
    // Source t: identical strings but df=1 within t -> everything kept.
    assert(out(3).getLong(2) == 3L &&
      out(3).getString(3) == md5hex("nav\nother\nfooter"))
    // All-boilerplate page: kept count and digest are null, row survives.
    assert(out(4).isNullAt(2) && out(4).isNullAt(3))
  }

  test("multi-line order is reassembled by position, not value") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "zz\naa\nmm"),
      (2L, "s", "x"),
      (3L, "s", "y"))
      .toDF("doc_id", "source", "text")
    val out = Boilerplate.strip(docs, "text", "doc_id", "source", minDf = 3)
      .orderBy("doc_id").collect()
    // Nothing repeats: doc 1 must come back in ORIGINAL order zz,aa,mm —
    // a value-sorted reassembly would emit aa,mm,zz and fail here.
    assert(out(0).getString(3) == md5hex("zz\naa\nmm"))
  }

  test("q_boilerplate: PAIR survives, NAV/COPYRIGHT stripped at real df") {
    val rows = CurateOps.qBoilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    // Every document keeps its unique prose line (n_kept >= 1) and its
    // PAIR line shares at most 2 docs, so n_kept >= 2 whenever the source
    // has >= 3 documents (NAV/COPYRIGHT stripped, PAIR + text kept).
    for (r <- rows) {
      assert(r.getLong(1) >= 4L && r.getLong(1) <= 5L) // 4 or 5 page lines
      assert(!r.isNullAt(2) && r.getLong(2) >= 1L)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // At least one source must be big enough for NAV to be stripped.
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }
}
