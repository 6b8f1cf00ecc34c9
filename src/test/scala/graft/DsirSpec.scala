package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir
import graft.queries.TrainOps

/** DSIR importance resampling (Dsir.scala): target-likeness ordering,
  * deterministic selection semantics, and the registered query. */
class DsirSpec extends SparkSpec {

  test("target-like documents outscore off-target ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, true, "good clean prose about spark joins and shuffles"),
      (2L, true, "good clean prose about spark aggregation plans"),
      (3L, false, "good clean prose about spark window functions"), // target-like raw doc
      (4L, false, "zzz qqq vvv kkk jjj xxx www uuu"))               // off-target junk
      .toDF("doc_id", "is_t", "text")
    val out = Dsir.select(docs, "text", "doc_id", col("is_t"),
        nBuckets = 64, topK = 3)
      .orderBy("doc_id").collect()
    val score = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // Doc 3 shares the target's bigrams; doc 4 shares none. The importance
    // score must reflect that with a wide margin.
    assert(score(3L) > score(4L),
      s"expected target-like 3 > junk 4, got $score")
    // topK=3 with doc 4 scoring strictly lowest -> exactly docs 1,2,3.
    val selected = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(selected == Set(1L, 2L, 3L))
  }

  test("threshold admits ties deterministically") {
    import spark.implicits._
    // Two identical documents tie; topK=1 must select BOTH (>= threshold),
    // never an arbitrary one.
    val docs = Seq(
      (1L, true, "alpha beta gamma"),
      (2L, false, "alpha beta gamma"),
      (3L, false, "delta epsilon zeta"))
      .toDF("doc_id", "is_t", "text")
    val out = Dsir.select(docs, "text", "doc_id", col("is_t"),
        nBuckets = 64, topK = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == out(1).getLong(2))
    assert(out(0).getBoolean(3) && out(1).getBoolean(3) &&
      !out(2).getBoolean(3))
  }

  test("q_dsir: every scored doc has grams; selection is a top slice") {
    val rows = TrainOps.qDsir(spark, sf).collect()
    assert(rows.nonEmpty)
    val selected = rows.filter(_.getBoolean(3))
    assert(selected.nonEmpty && selected.length < rows.length)
    // The ">= threshold" contract: every selected score >= every
    // unselected score.
    val minSel = selected.map(_.getLong(2)).min
    val maxUnsel = rows.filterNot(_.getBoolean(3)).map(_.getLong(2)).max
    assert(minSel >= maxUnsel)
    assert(rows.forall(_.getLong(1) >= 1L))
  }
}
