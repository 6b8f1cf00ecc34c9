package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profile, Vocab}

/** Round-4 curation operators: BPE pair statistics, per-column profiling,
  * incremental near-dedup. */
class CurateOpsSpec extends SparkSpec {
  import spark.implicits._

  test("readability: hand-computed Flesch on punctuated text, null on empty") {
    // "The cat sat. The dog ran!": 6 words, 2 sentences, 6 vowel groups
    // → 206.835 − 1.015·3 − 84.6·1 = 119.190 → 119190 milli
    val docs = Seq((1L, "The cat sat. The dog ran!"), (2L, ""))
      .toDF("doc_id", "text")
    val got = graft.queries.CurateOps.readability(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 6L)
    assert(got(1L).getLong(2) === 2L)
    assert(got(1L).getLong(3) === 6L)
    assert(got(1L).getLong(4) === 119190L)
    // empty text: ONE word under the repo-wide split convention (matching
    // DuckDB string_split — the cross-engine contract), zero syllables →
    // 206.835 − 1.015·1 − 0 = 205.820; sentence floor holds at 1
    assert(got(2L).getLong(1) === 1L && got(2L).getLong(2) === 1L)
    assert(got(2L).getLong(3) === 0L)
    assert(got(2L).getLong(4) === 205820L)
  }

  test("bpePairCounts weights by word frequency and keeps in-word multiplicity") {
    // "ab ab aaa" + "ab" → freq(ab)=3, freq(aaa)=1
    // pairs: "ab"×3 (from ab), "aa"×2 (from aaa, multiplicity 2)
    val df = Seq("ab ab aaa", "ab").toDF("text")
    val out = Vocab.bpePairCounts(df, "text", topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("ab") === (3L, 1L))
    assert(out("aa") === (2L, 1L))
    assert(out.size === 2)
  }

  test("bpePairCounts drops one-char words from pairs, ranks by count then pair") {
    val df = Seq("a a a a zz yy zz").toDF("text")
    val rows = Vocab.bpePairCounts(df, "text", topK = 10).collect()
    // "a" has no pair; zz (freq 2) ranks above yy (freq 1)
    assert(rows.map(_.getString(0)).toSeq === Seq("zz", "yy"))
    assert(rows.head.getLong(1) === 2L)
  }

  test("columnProfile counts nulls/distincts and types min/max by kind") {
    val df = Seq[(java.lang.Long, String)]((1L, "b"), (3L, null), (3L, "a"))
      .toDF("n", "s")
    val out = Profile.columnProfile(df,
        Seq("n" -> Profile.Num, "s" -> Profile.Str))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = out("n")
    assert(n.getAs[Long]("n_rows") === 3L && n.getAs[Long]("n_nulls") === 0L)
    assert(n.getAs[Long]("n_distinct") === 2L)
    assert(n.getAs[Double]("min_num") === 1.0 &&
      n.getAs[Double]("max_num") === 3.0)
    assert(n.isNullAt(n.fieldIndex("min_str")))
    val s = out("s")
    assert(s.getAs[Long]("n_nulls") === 1L)
    assert(s.getAs[Long]("n_distinct") === 2L)   // nulls not distinct-counted
    assert(s.getAs[String]("min_str") === "a" &&
      s.getAs[String]("max_str") === "b")
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("kAnonCounts handles numeric quasi columns: released as strings with a '*' bucket") {
    // a LONG quasi column: the safe branch must cast to string so the
    // '*'-sentinel union is type-compatible (released schema is all-string)
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("grp", "src")
    val out = Profile.kAnonCounts(df, Seq("grp", "src"), k = 3L)
    assert(out.schema("grp").dataType.typeName === "string")
    val rows = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows === Set(("1", "a", 3L, 1L), ("*", "*", 2L, 2L)))
  }

  test("keySkew flags a planted hot key and ranks deterministically") {
    // 50 rows of key 1 against 12 singleton keys: mean = 62/13 ≈ 4.8,
    // 50 > 10x mean (50·13 = 650 > 620 = 62·10) → hot; singletons are not
    val df = (Seq.fill(50)(1L) ++ (2L to 13L)).toDF("k")
    val out = Profile.keySkew(df, "k", topN = 5).collect()
    assert(out.length === 5)
    val top = out.head
    assert(top.getAs[Long]("key") === 1L && top.getAs[Long]("n") === 50L)
    assert(top.getAs[Boolean]("hot"))
    assert(top.getAs[Long]("pm") === 50L * 1000 / 62)
    assert(out.tail.forall(!_.getAs[Boolean]("hot")))
    // rank ties break on key: singleton keys 2..5 in key order
    assert(out.tail.map(_.getAs[Long]("key")).toSeq === Seq(2L, 3L, 4L, 5L))
  }

  test("incrementalNear flags near-dups of the store, keeps novel and short docs") {
    val store = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "totally unrelated store content about engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (3L, "completely novel batch document with fresh words"),
      (5L, "too short")                                     // no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNear(batch, store, "text", "doc_id", 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 3L, 5L))
    val dup = out(1L)
    assert(!dup.getAs[Boolean]("is_novel"))
    assert(dup.getAs[Long]("near_store_id") === 0L)
    assert(dup.getAs[Double]("dist") > 0.0 && dup.getAs[Double]("dist") <= 0.5)
    assert(out(3L).getAs[Boolean]("is_novel"))
    assert(out(5L).getAs[Boolean]("is_novel"))
  }

  test("incrementalNear breaks distance ties to the lowest store id") {
    val text = "one two three four five six seven eight"
    val store = Seq((10L, text), (4L, text)).toDF("doc_id", "text")
    val batch = Seq((7L, text)).toDF("doc_id", "text")
    val r = Dedup.incrementalNear(batch, store, "text", "doc_id", 0.5).head()
    assert(r.getAs[Double]("dist") === 0.0)
    assert(r.getAs[Long]("near_store_id") === 4L)
  }

  test("incrementalNear never pairs batch with batch or store with store") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    // two identical docs in the batch, none in the store: both must be novel
    val batch = Seq((1L, text), (3L, text)).toDF("doc_id", "text")
    val store = Seq((0L, "entirely different seen content here okay fine"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNear(batch, store, "text", "doc_id", 0.5)
    assert(out.collect().forall(_.getAs[Boolean]("is_novel")))
  }


  test("ttr: MATTR equals a hand-rolled sliding-window mean; short docs keep NULL mattr") {
    val out = graft.queries.LlmOps.qTtr(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.length === docs.size, "every document keeps its row")
    out.foreach { r =>
      val ws = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tokens") === ws.length.toLong)
      assert(r.getAs[Long]("n_types") === ws.distinct.length.toLong)
      assert(r.getAs[Long]("ttr_permille") ===
        ws.distinct.length.toLong * 1000 / ws.length)
      if (ws.length < 10)
        assert(r.isNullAt(r.fieldIndex("mattr_permille")))
      else {
        val wins = ws.sliding(10).map(_.distinct.length.toLong).toSeq
        assert(r.getAs[Long]("mattr_permille") ===
          wins.sum * 1000 / (10 * wins.length))
      }
    }
  }
}
