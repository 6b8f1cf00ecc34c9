package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN quality checks: the approximate paths must agree with the exact
  * brute-force top-k on recall, not just run. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
  private lazy val corpus = emb.select("vec_id", "embedding")

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("IVF top-k recall beats the probe fraction on random embeddings") {
    // The fixture embeddings are uniform random — the worst case for IVF
    // (no cluster structure, neighbours spread evenly over cells), where
    // expected recall ≈ the probe fraction (4/16 = 25%). Clustered real
    // corpora recall far higher; the full-probe test below pins exactness.
    val exact = topkSet(Similarity.cosineTopK(queries, corpus, 10))
    val ivf = topkSet(Similarity.ivfTopK(queries, corpus, 10,
      nCells = 16, nProbe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall exact=${exact.size} ivf=${ivf.size}")
    // every IVF hit must carry the same rounded sim as the exact ranking
    assert(ivf.subsetOf(topkSet(Similarity.cosineTopK(queries, corpus, 500))))
  }

  test("IVF with full probing equals exact brute force") {
    val exact = topkSet(Similarity.cosineTopK(queries, corpus, 10))
    val full = topkSet(Similarity.ivfTopK(queries, corpus, 10,
      nCells = 4, nProbe = 4))
    assert(full === exact)
  }
}
