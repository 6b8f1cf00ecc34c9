package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (SURVEY.md §2 B-10).
  *
  * Scale posture (100 TB):
  * - `cosineTopK` is the exact baseline: queries are broadcast, the corpus is
  *   scanned once (BroadcastNestedLoopJoin), per-partition top-k via window.
  *   Linear in corpus size × #queries — right up to a few thousand queries.
  * - `annCandidates` is the LSH path: random-projection buckets on
  *   L2-normalized vectors (euclidean order ≡ cosine order), candidates from
  *   a narrow bucket-key join, distances from the codegen cosine kernel.
  * - `ivfTopK` / `writeIvfLayout` + `probeIvfLayout` are the IVF path:
  *   k-means cells, probe nProbe of nCells; at rest the cell id is the
  *   partition directory, so probing IS partition pruning.
  *
  * mllib contributes only model FITS (seeded hyperplanes / centroids);
  * every candidate join and distance evaluation is the engine's own —
  * `approxSimilarityJoin`'s interpreted per-candidate vector ops are the
  * same trap measured at 505 s on the minhash path, avoided throughout.
  */
object Similarity {

  // ---- shared building blocks ----

  /** L2-normalize `emb` into an mllib `nvec` column. The norm is its own
    * column first — an inline norm inside the transform lambda would be
    * recomputed per vector ELEMENT (interpreted, no CSE). */
  private def l2Normalized(df: DataFrame, emb: String): DataFrame =
    df.withColumn("_norm", VectorFunctions.norm(col(emb)))
      .withColumn("nvec", array_to_vector(
        transform(col(emb), x => x.cast("double") / col("_norm"))))
      .drop("_norm")

  private def fitLsh(cn: DataFrame, bucketLength: Double,
      numHashTables: Int): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setInputCol("nvec").setOutputCol("buckets")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42)
      .fit(cn)

  /** Narrow (id, (table, bucket)) keys — one row per hash table per vector. */
  private def lshBucketKeys(model: BucketedRandomProjectionLSHModel,
      df: DataFrame, idCol: String): DataFrame =
    model.transform(df)
      .select(col(idCol), posexplode(col("buckets")).as(Seq("t", "h")))
      .select(col(idCol),
        struct(col("t"), element_at(vector_to_array(col("h")), 1)).as("bk"))

  private def fitQuantizer(corpus: DataFrame, nCells: Int): KMeansModel =
    // a coarse quantizer only needs roughly-balanced cells, not converged
    // centroids — 8 iterations is plenty (default 20 just burns fit passes;
    // recall is asserted in SimilaritySpec either way). At 100 TB the fit
    // runs on a corpus SAMPLE; assignment is the only full pass.
    new KMeans().setK(nCells).setSeed(42).setMaxIter(8)
      .setFeaturesCol("fvec").setPredictionCol("cell_id")
      .fit(corpus.withColumn("fvec", array_to_vector(col("embedding"))))

  /** The (tiny) centroid table driving probes: (cell_id, centroid). */
  private def centroidTable(model: KMeansModel,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell_id", "centroid")
  }

  /** Each query scores all centroids with the codegen kernel and keeps its
    * `nProbe` nearest cells: (q_id, q_emb, cell_id). */
  private def probeCells(queries: DataFrame, centroids: DataFrame,
      nProbe: Int): DataFrame = {
    val probeW = Window.partitionBy("q_id")
      .orderBy(desc("c_sim"), asc("cell_id"))
    broadcast(queries).crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        VectorFunctions.cosine(col("q_emb"), col("centroid")))
      .withColumn("c_rnk", row_number().over(probeW))
      .filter(col("c_rnk") <= nProbe)
      .select("q_id", "q_emb", "cell_id")
  }

  /** Exact-kernel rerank over candidate (q_emb, vec_id, embedding) rows +
    * window top-k — the shared tail of every top-k variant. `sim` is
    * rounded to 6 dp BEFORE ranking so the ordering is reproducible across
    * engines; ties break on corpus id. */
  private def rerankTopK(candidates: DataFrame, k: Int): DataFrame = {
    val sims = candidates
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "sim")
  }

  // ---- public operators ----

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors — queries broadcast, the corpus scanned once, one
    * codegen'd single-pass kernel per pair. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    // queries: (q_id, q_emb), corpus: (vec_id, embedding)
    rerankTopK(broadcast(queries).crossJoin(corpus), k)

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only its
    * `nProbe` nearest cells and reranks those candidates with the exact
    * codegen'd cosine kernel. Seeded and deterministic given the corpus.
    * The at-rest twin is `writeIvfLayout` + `probeIvfLayout`. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val model = fitQuantizer(corpus, nCells)
    val assigned = model.transform(
      corpus.withColumn("fvec", array_to_vector(col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("cell_id"))
    val probed = probeCells(queries,
      centroidTable(model, corpus.sparkSession), nProbe)
    rerankTopK(probed.join(assigned, "cell_id"), k)
  }

  /** Materialize the IVF layout at rest: the corpus written partitioned by
    * its k-means cell id — one directory per cell. Returns the centroid
    * table (cell_id, centroid) that drives probes. At 100 TB this is the
    * similarity-search table layout: a probe touches nProbe/nCells of the
    * bytes because the filesystem layout IS the index. */
  def writeIvfLayout(corpus: DataFrame, path: String,
      nCells: Int = 16): DataFrame = {
    val model = fitQuantizer(corpus, nCells)
    model.transform(
      corpus.withColumn("fvec", array_to_vector(col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(path)
    centroidTable(model, corpus.sparkSession)
  }

  /** Probe the at-rest IVF layout: the probed (q_id, cell_id) set
    * equi-joins the partitioned corpus, and Dynamic Partition Pruning turns
    * that join into a read of ONLY the probed cell directories (asserted at
    * plan level in SimilaritySpec); rerank is the shared exact-kernel
    * top-k tail. */
  def probeIvfLayout(path: String, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 4): DataFrame = {
    val probed = probeCells(queries, centroids, nProbe)
    val corpus = queries.sparkSession.read.parquet(path)
    rerankTopK(corpus.join(broadcast(probed), "cell_id"), k)
  }

  /** LSH-bucketed cosine-threshold SELF-join: candidate pairs share a
    * random-projection bucket in at least one hash table; every candidate is
    * then verified by the exact codegen'd cosine kernel, so the bucketing
    * only affects recall, never emits a false pair. This replaces an
    * all-pairs crossJoin as the embedding-dedup plan shape.
    *
    * The bucket join runs NARROW (ids + band key only) and the candidate
    * stream is de-duplicated BEFORE the embedding-attach joins: a pair
    * colliding in k of the hash tables appears k times, and the distinct is
    * a shuffle of two longs per candidate, while every duplicate that
    * survives past it would drag two full embedding payloads through the
    * attach joins and the kernel. (Measured at sf0.1: distinct-after-verify
    * 5.7 s vs distinct-before-attach ~2 s — the narrow shuffle wins at any
    * collision rate, and by more the hotter the buckets get.) Survivors then
    * stream through the attach joins (Catalyst/AQE picks broadcast vs
    * shuffle by actual corpus size) into the codegen kernel.
    *
    * Operating-point honesty: pruning power depends on `minSim`. At
    * production near-dup thresholds the bucket join discards most pairs; at
    * a low threshold on isotropic data most pairs survive the gate and the
    * cost is carried by the codegen verify — which is exactly the all-pairs
    * kernel cost, so the gate never loses to the crossJoin it replaces.
    * The default (bucketLength 2.0, 6 tables) is the cheapest setting whose
    * recall is exhaustive on the test fixtures — the parity test in
    * SimilaritySpec re-checks that contract against the exact join. */
  def cosinePairs(corpus: DataFrame, minSim: Double,
      bucketLength: Double = 2.0, numHashTables: Int = 6): DataFrame = {
    val cn = l2Normalized(corpus, "embedding")
    val model = fitLsh(cn, bucketLength, numHashTables)
    val keys = lshBucketKeys(model, cn, "vec_id")
    keys.select(col("vec_id").as("a_id"), col("bk"))
      .join(keys.select(col("vec_id").as("b_id"), col("bk")), "bk")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .join(corpus.select(col("vec_id").as("a_id"),
        col("embedding").as("a_emb")), "a_id")
      .join(corpus.select(col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), "b_id")
      .withColumn("sim",
        round(VectorFunctions.cosine(col("a_emb"), col("b_emb")), 6))
      .filter(col("sim") >= minSim)
      .select("a_id", "b_id", "sim")
  }

  /** Scalar-quantized (SQ8) top-k: each dimension is quantized to 8 bits
    * against per-dimension corpus min/max, and ranking runs on the
    * DEQUANTIZED vectors — the compressed-vector scale path (4× less
    * at-rest IO and cache footprint than float32; at 100 TB the quantized
    * table is what the scan reads, with exact rerank over the tiny top-k
    * candidate set as the optional refinement). Unlike LSH/IVF this is
    * deterministic arithmetic end-to-end, so the whole path is
    * oracle-checkable: the DuckDB oracle reproduces the same quantize →
    * dequantize → rounded-cosine ranking bit-for-bit.
    *
    * Plan shape: the per-dimension stats are one posexplode aggregate
    * folded to a single broadcast row (never a driver collect); quantization
    * is a per-row projection; ranking is the shared exact-kernel tail. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val stats = corpus
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(
        sort_array(collect_list(struct(col("i"), col("mn")))).as("mns"),
        sort_array(collect_list(struct(col("i"), col("mx")))).as("mxs"))
      .select(
        transform(col("mns"), s => s.getField("mn")).as("mn"),
        transform(col("mxs"), s => s.getField("mx")).as("mx"))
    // dequantized value = mn + round((x−mn)·255/(mx−mn))·(mx−mn)/255 —
    // written in exactly this operation order on both engines. A constant
    // dimension (mx == mn) dequantizes to mn.
    def dq(emb: Column): Column =
      transform(
        arrays_zip(emb.cast("array<double>"), col("mn"), col("mx")),
        s => {
          val (x, mn, mx) = (s.getField("0"), s.getField("mn"), s.getField("mx"))
          when(mx > mn,
            mn + round((x - mn) * lit(255.0) / (mx - mn)) * (mx - mn) / lit(255.0))
            .otherwise(mn)
        })
    val cq = corpus.crossJoin(broadcast(stats))
      .select(col("vec_id"), dq(col("embedding")).as("embedding"))
    val qq = queries.crossJoin(broadcast(stats))
      .select(col("q_id"), dq(col("q_emb")).as("q_emb"))
    rerankTopK(broadcast(qq).crossJoin(cq), k)
  }

  /** Approximate nearest neighbours via random-projection LSH buckets.
    * Vectors are L2-normalized first so euclidean NN order == cosine order.
    * Returns (q_id, vec_id, dist) candidate pairs within `maxDistance`,
    * where dist is the euclidean distance between the normalized vectors
    * (= √(2 − 2·cosine)). */
  def annCandidates(queries: DataFrame, corpus: DataFrame,
      maxDistance: Double, bucketLength: Double = 0.5,
      numHashTables: Int = 4): DataFrame = {
    val cn = l2Normalized(corpus, "embedding")
    val model = fitLsh(cn, bucketLength, numHashTables)
    val cands = lshBucketKeys(model, l2Normalized(queries, "q_emb"), "q_id")
      .join(lshBucketKeys(model, cn, "vec_id"), "bk")
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
