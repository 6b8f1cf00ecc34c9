package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (SURVEY.md §2 B-10).
  *
  * Scale posture (100 TB):
  * - `cosineTopK` is the exact baseline: queries are broadcast, the corpus is
  *   scanned once (BroadcastNestedLoopJoin), per-partition top-k via window.
  *   Linear in corpus size × #queries — right up to a few thousand queries.
  * - `annTopK` is the sub-linear path: BucketedRandomProjectionLSH buckets
  *   (euclidean on L2-normalized vectors ≡ cosine ordering), probing only
  *   matching buckets. An IVF variant would pre-cluster with k-means
  *   (mllib KMeans) and probe nProbe centroids — same plan shape.
  */
object Similarity {

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors — one codegen'd single-pass kernel per pair. `sim` is
    * rounded to 6 dp BEFORE ranking so the ordering is reproducible across
    * engines (float-sum last-ulp drift cannot flip ranks); ties break on
    * corpus id. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // queries: (q_id, q_emb), corpus: (vec_id, embedding)
    val sims = broadcast(queries).crossJoin(corpus)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "sim")
  }

  /** Approximate nearest neighbours via random-projection LSH buckets.
    * Vectors are L2-normalized first so euclidean NN order == cosine order.
    * Returns (q_id, vec_id, dist) candidate pairs within `maxDistance`. */
  def annCandidates(queries: DataFrame, corpus: DataFrame,
      maxDistance: Double, bucketLength: Double = 0.5,
      numHashTables: Int = 4): DataFrame = {
    // norm as its own column first — an inline norm inside the transform
    // lambda would be recomputed per vector ELEMENT (interpreted, no CSE)
    def normalized(df: DataFrame, emb: String): DataFrame =
      df.withColumn("_norm", VectorFunctions.norm(col(emb)))
        .withColumn("nvec", array_to_vector(
          transform(col(emb), x => x.cast("double") / col("_norm"))))
        .drop("_norm")
    val qn = normalized(queries, "q_emb")
    val cn = normalized(corpus, "embedding")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nvec").setOutputCol("buckets")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42)
    val model = lsh.fit(cn)
    model.approxSimilarityJoin(qn, cn, maxDistance, "dist")
      .select(
        col("datasetA.q_id").as("q_id"),
        col("datasetB.vec_id").as("vec_id"),
        col("dist"))
      .filter(col("q_id") =!= col("vec_id"))
  }
}
