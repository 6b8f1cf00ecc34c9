package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
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

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only its
    * `nProbe` nearest cells and reranks those candidates with the exact
    * codegen'd cosine kernel. The classic sub-linear ANN layout: at 100 TB
    * the corpus is written partitioned by cell_id, so a probe reads
    * nProbe/nCells of the data — partition pruning does the work, and the
    * rerank is cosineTopK's plan over a fraction of the corpus. Seeded and
    * deterministic given the corpus. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val fc = corpus.withColumn("fvec", array_to_vector(col("embedding")))
    val km = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fvec").setPredictionCol("cell_id")
    val model = km.fit(fc)
    val assigned = model.transform(fc).select(
      col("vec_id"), col("embedding"), col("cell_id"))

    // centroid table is tiny → broadcast; each query scores all centroids
    // and keeps its nProbe nearest (by the same cosine kernel).
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell_id", "centroid")
    val probeW = Window.partitionBy("q_id")
      .orderBy(desc("c_sim"), asc("cell_id"))
    val probed = broadcast(queries).crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        VectorFunctions.cosine(col("q_emb"), col("centroid")))
      .withColumn("c_rnk", row_number().over(probeW))
      .filter(col("c_rnk") <= nProbe)
      .select("q_id", "q_emb", "cell_id")

    // rerank: exact cosine only inside the probed cells
    val sims = probed.join(assigned, "cell_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "sim")
  }

  /** Materialize the IVF layout at rest: the corpus written partitioned by
    * its k-means cell id — one directory per cell. Returns the centroid
    * table (cell_id, centroid) that drives probes. At 100 TB this is the
    * similarity-search table layout: a probe touches nProbe/nCells of the
    * bytes because the filesystem layout IS the index. */
  def writeIvfLayout(corpus: DataFrame, path: String,
      nCells: Int = 16): DataFrame = {
    val fc = corpus.withColumn("fvec", array_to_vector(col("embedding")))
    val km = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fvec").setPredictionCol("cell_id")
    val model = km.fit(fc)
    model.transform(fc).select(col("vec_id"), col("embedding"), col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(path)
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell_id", "centroid")
  }

  /** Probe the at-rest IVF layout: each query scores the (tiny, broadcast)
    * centroid table with the codegen cosine kernel and keeps its `nProbe`
    * nearest cells; the probed (q_id, cell_id) set then equi-joins the
    * partitioned corpus, and Dynamic Partition Pruning turns that join into
    * a read of ONLY the probed cell directories (asserted at plan level in
    * SimilaritySpec). Rerank is the exact kernel + window top-k — the same
    * tail as cosineTopK over a fraction of the data. */
  def probeIvfLayout(path: String, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val probeW = Window.partitionBy("q_id")
      .orderBy(desc("c_sim"), asc("cell_id"))
    val probed = broadcast(queries).crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        VectorFunctions.cosine(col("q_emb"), col("centroid")))
      .withColumn("c_rnk", row_number().over(probeW))
      .filter(col("c_rnk") <= nProbe)
      .select("q_id", "q_emb", "cell_id")
    val sims = spark.read.parquet(path)
      .join(broadcast(probed), "cell_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "sim")
  }

  /** LSH-bucketed cosine-threshold SELF-join: candidate pairs share a
    * random-projection bucket in at least one hash table; every candidate is
    * then verified by the exact codegen'd cosine kernel, so the bucketing
    * only affects recall, never emits a false pair. This replaces an
    * all-pairs crossJoin as the embedding-dedup plan shape.
    *
    * The candidate join and the distance verification are the engine's own
    * (hash-partitioned equi-join on (table, bucket) + one whole-stage-codegen
    * cosine per candidate); mllib contributes only the seeded random
    * hyperplanes. mllib's `approxSimilarityJoin` computes each candidate
    * distance with interpreted vector ops — measured minutes vs seconds on
    * the same candidate set.
    *
    * Operating-point honesty: pruning power depends on `minSim`. At
    * production near-dup thresholds the bucket join discards most pairs; at
    * a low threshold on isotropic data most pairs survive the gate and the
    * cost is carried by the codegen verify — which is exactly the all-pairs
    * kernel cost, so the gate never loses to the crossJoin it replaces. */
  def cosinePairs(corpus: DataFrame, minSim: Double,
      bucketLength: Double = 2.0, numHashTables: Int = 6): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val cn = corpus
      .withColumn("_norm", VectorFunctions.norm(col("embedding")))
      .withColumn("nvec", array_to_vector(
        transform(col("embedding"), x => x.cast("double") / col("_norm"))))
      .drop("_norm")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nvec").setOutputCol("buckets")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42)
    // bucket join runs NARROW (ids + band key only); candidates stream
    // straight through the embedding-attach joins (Catalyst/AQE picks
    // broadcast vs shuffle by actual corpus size) into the codegen kernel,
    // and only the tiny SURVIVOR set is de-duplicated. A pair colliding in
    // k tables is verified k times, but the kernel is ~100 ns/pair while a
    // distinct over the full candidate stream is a shuffle of that whole
    // stream — re-verification is the cheaper side of the trade.
    val keys = lsh.fit(cn).transform(cn)
      .select(col("vec_id"),
        posexplode(col("buckets")).as(Seq("t", "h")))
      .select(col("vec_id"),
        struct(col("t"), element_at(vector_to_array(col("h")), 1)).as("bk"))
    keys.select(col("vec_id").as("a_id"), col("bk"))
      .join(keys.select(col("vec_id").as("b_id"), col("bk")), "bk")
      .filter(col("a_id") < col("b_id"))
      .join(corpus.select(col("vec_id").as("a_id"),
        col("embedding").as("a_emb")), "a_id")
      .join(corpus.select(col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), "b_id")
      .withColumn("sim",
        round(VectorFunctions.cosine(col("a_emb"), col("b_emb")), 6))
      .filter(col("sim") >= minSim)
      .select("a_id", "b_id", "sim")
      .distinct()
  }

  /** Approximate nearest neighbours via random-projection LSH buckets.
    * Vectors are L2-normalized first so euclidean NN order == cosine order.
    * Returns (q_id, vec_id, dist) candidate pairs within `maxDistance`,
    * where dist is the euclidean distance between the normalized vectors
    * (= √(2 − 2·cosine)).
    *
    * mllib contributes only the seeded hyperplanes (fit); the candidate
    * join runs narrow on (table, bucket) keys and every candidate distance
    * is one codegen'd cosine kernel — `approxSimilarityJoin`'s interpreted
    * per-candidate vector ops are the same trap measured at 505 s on the
    * minhash path, avoided here identically. */
  def annCandidates(queries: DataFrame, corpus: DataFrame,
      maxDistance: Double, bucketLength: Double = 0.5,
      numHashTables: Int = 4): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
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
    def bucketKeys(df: DataFrame, idCol: String): DataFrame =
      model.transform(df)
        .select(col(idCol), posexplode(col("buckets")).as(Seq("t", "h")))
        .select(col(idCol),
          struct(col("t"), element_at(vector_to_array(col("h")), 1)).as("bk"))
    val cands = bucketKeys(qn, "q_id").join(bucketKeys(cn, "vec_id"), "bk")
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
      .distinct()
    cands
      .join(queries.select(col("q_id"), col("q_emb")), "q_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("dist",
        sqrt(greatest(lit(0.0),
          lit(2.0) - lit(2.0) *
            VectorFunctions.cosine(col("q_emb"), col("embedding")))))
      .filter(col("dist") <= maxDistance)
      .select("q_id", "vec_id", "dist")
  }
}
