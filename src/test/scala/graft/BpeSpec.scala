package graft

import graft.operators.Bpe
import graft.queries.CurateOps

/** Iterative BPE training (Bpe.scala): hand-computed fixture semantics
  * (Sennrich merge order, overlap handling, tie-breaks), encoding counts,
  * and the registered queries. */
class BpeSpec extends SparkSpec {

  test("merge order, overlap scan, and expansion match hand-computed BPE") {
    import spark.implicits._
    // Words: aaab x2, ab x1.
    // Round 0 pairs: aa:4 (twice inside aaab, freq 2), ab:3 -> merge aa.
    //   Overlap scan: "aaab" -> [aa]ab -> one merged symbol, NOT two.
    // Round 1: with aaab = <aa>ab: <aa>a:2, ab:2+1=3 -> merge ab.
    // Round 2: <aa><ab>:2 -> merge to the full word aaab.
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 3)
      .orderBy("merge_rank").collect()
    assert(merges.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((0, "aa", 4L), (1, "ab", 3L), (2, "aaab", 2L)))
  }

  test("ties break on pair string, deterministically") {
    import spark.implicits._
    // xy and yz both count 2: the lexicographically smaller pair (in the
    // single-char symbol space) must win every run.
    val docs = Seq("xyq yz xyr yz").toDF("text")
    val m = Bpe.train(docs, "text", nMerges = 1).collect()
    assert(m.head.getString(1) == "xy" && m.head.getLong(2) == 2L)
  }

  test("encode counts words, chars, and merged subwords per document") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab"))
      .toDF("doc_id", "text")
    val (_, vocab) = Bpe.trainVocab(docs, "text", nMerges = 2)
    // After 2 merges: aaab = <aa><ab> (2 symbols), ab = <ab> (1 symbol).
    val out = Bpe.encode(docs, "text", "doc_id", vocab)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((1L, 3L, 10L, 5L), (2L, 1L, 4L, 2L)))
  }

  test("registered queries: 16 ranked merges, encode covers every doc") {
    val merges = CurateOps.qBpeTrain(spark, sf).collect()
    assert(merges.map(_.getInt(0)).toSeq == (0 until 16).toSeq)
    assert(merges.forall(r => r.getString(1).nonEmpty && r.getLong(2) > 0))
    // A later merge can reference an earlier one, so some token should be
    // longer than 2 chars once 16 rounds have run on a zipfy corpus.
    assert(merges.exists(_.getString(1).length > 2))
    val enc = CurateOps.qBpeEncode(spark, sf).collect()
    assert(enc.nonEmpty)
    // Merging can only shrink: subwords <= chars, and >= word count.
    for (r <- enc) {
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(3) >= r.getLong(1))
    }
  }
}
