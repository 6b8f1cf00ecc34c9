package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, NGram, RegexTokenizer}
import graft.functions.TextFunctions

/** Deduplication operators for document corpora (SURVEY.md §2 B-10).
  *
  * Scale posture (100 TB):
  * - `exact`: one hash-partitioned shuffle on the content digest; identical
  *   to the dedup a production pretraining pipeline runs. No skew risk (the
  *   digest is uniform by construction).
  * - `ngramJaccardPairs`: exact pairwise Jaccard via a shared-shingle
  *   self-join — candidate generation is bounded by shingle document
  *   frequency, so extremely common shingles explode the join; `maxShingleDf`
  *   drops them (they carry no discriminative signal). This is the exact
  *   verifier; `nearMinhashLsh` is the sub-quadratic candidate generator.
  * - `nearMinhashLsh`: MinHash + banding (spark-mllib). Cost is
  *   O(rows × signature), candidate pairs only within equal bands —
  *   the standard web-scale near-dup design.
  * - `simhashPairs`: 64-bit SimHash + Hamming ≤ k verification. Signature
  *   build is one codegen pass; the pairing here is an exact self-join by
  *   signature band (16-bit chunks), same banding trick as MinHash-LSH.
  */
object Dedup {

  /** Exact dedup by content digest, keeping the lowest id per group. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = sha2(col(textCol), 256)
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.withColumn("content_hash", h)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Exact word-n-gram Jaccard similarity for all pairs above `threshold`.
    * Shingles with document frequency > `maxShingleDf` are dropped from
    * candidate generation (stop-shingle guard — at corpus scale a shingle
    * present in 1% of documents would otherwise dominate the join). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
          .as("g"))
    val filtered =
      if (maxShingleDf == Long.MaxValue) sh
      else {
        val dfreq = sh.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("g")
        sh.join(broadcast(dfreq), "g")
      }
    val counts = filtered.groupBy("doc").agg(count(lit(1)).as("c"))
    val inter = filtered.select(col("doc").as("a_id"), col("g"))
      .join(filtered.select(col("doc").as("b_id"), col("g")), "g")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    inter
      .join(counts.select(col("doc").as("a_id"), col("c").as("ca")), "a_id")
      .join(counts.select(col("doc").as("b_id"), col("c").as("cb")), "b_id")
      .withColumn("jaccard",
        col("i").cast("double") / (col("ca") + col("cb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Near-duplicate candidate pairs via the standard shingle → MinHash →
    * banding pipeline (spark-mllib): word `shingleN`-grams, hashed to a
    * binary feature space, MinHash signatures, LSH band join. Shingles (not
    * raw tokens) are the similarity unit — token sets saturate on small
    * vocabularies and at web scale carry no order information. Returns
    * (a_id, b_id, dist) where dist is the exact Jaccard distance on the
    * shingle feature sets for band-colliding pairs ≤ `maxDistance`. */
  def nearMinhashLsh(df: DataFrame, textCol: String, idCol: String,
      maxDistance: Double, numHashTables: Int = 8,
      numFeatures: Int = 1 << 18, shingleN: Int = 3): DataFrame = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("toks")
      .setPattern("\\s+")
    val ngram = new NGram().setInputCol("toks").setOutputCol("shingles")
      .setN(shingleN)
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    val featured = tf.transform(
      ngram.transform(tok.transform(df.select(col(idCol), col(textCol)))))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(42)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, maxDistance, "dist")
      .select(
        col(s"datasetA.$idCol").as("a_id"),
        col(s"datasetB.$idCol").as("b_id"),
        col("dist"))
      .filter(col("a_id") < col("b_id"))
  }

  /** SimHash near-dup pairs: 64-bit signatures, candidates from equal 16-bit
    * bands (any pair within Hamming distance 3 shares at least one of the 4
    * bands), verified by exact Hamming ≤ `maxHamming`. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int): DataFrame = {
    val sigs = df.select(col(idCol).as("doc"),
      TextFunctions.simhash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFF).as("key"))): _*))
        .as("bk"))
    val cands = banded.select(col("doc").as("a_id"), col("sig").as("a_sig"), col("bk"))
      .join(banded.select(col("doc").as("b_id"), col("sig").as("b_sig"), col("bk")), "bk")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sig", "b_sig").distinct()
    cands
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }
}
