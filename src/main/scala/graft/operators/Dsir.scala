package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling" — public method): score raw
  * documents by how target-like their hashed n-gram profile is, and select
  * the top slice for training. The modern replacement for hand-written
  * quality rules when a trusted target corpus exists.
  *
  * Mechanics: word bigrams hash into `nBuckets` buckets (md5-derived so
  * the bucketing is engine-independent — part of the oracle contract, like
  * the md5 MinHash family); bucket unigram distributions are estimated for
  * the TARGET subset and the RAW corpus with Laplace smoothing; a
  * document's importance score is Σ_occurrences log(p_target(bucket) /
  * p_raw(bucket)), quantized per bucket to integer micro-nats BEFORE the
  * per-document sum (the float-order-immunity discipline every LM-score
  * operator here uses). Selection takes the top-K scores with a
  * deterministic ≥-threshold (ties admit equals, never a random subset).
  *
  * Scale shape: the corpus is exploded ONCE into (doc, bucket)
  * occurrences; both distribution estimates are `nBuckets`-bounded
  * aggregates with map-side partials; the log-ratio table (nBuckets rows)
  * BROADCASTS back onto the occurrence stream, so scoring never shuffles
  * the corpus — one doc-keyed sum finishes it. The selection threshold is
  * a TakeOrdered over K (bounded) folded to a one-row broadcast — no
  * global sort, no single-partition window.
  */
object Dsir {

  /** Engine-independent feature bucket: first 2 md5 hex chars (0..255)
    * mod B — the same per-hex-char arithmetic the digest oracles use, so
    * DuckDB reproduces it with two `strpos` terms. Requires B ≤ 256. */
  private def bucket(gram: Column, nBuckets: Int): Column =
    conv(substring(md5(gram), 1, 2), 16, 10).cast("long") % nBuckets

  /** Per-document importance scores + top-K selection.
    * `targetPred` marks the trusted target subset (e.g. a curated
    * high-quality source). Output per document with ≥1 bigram:
    * `(idCol, n_grams, score_micro, selected)`. */
  def select(docs: DataFrame, textCol: String, idCol: String,
      targetPred: Column, nBuckets: Int = 64, topK: Int = 100): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 256,
      s"nBuckets must be in [2, 256] (2-hex-char bucket source), got $nBuckets")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // The occurrence table feeds FOUR consumers (raw counts, target
    // counts, totals, the scoring join); Spark has no plan-level CSE, so
    // materialize it once or the corpus explode + md5 run four times —
    // same discipline as the Jaccard pair join's checkpointed shingles.
    val occ = docs
      .select(col(idCol), targetPred.as("is_target"),
        explode(TextFunctions.wordShingles(col(textCol), 2)).as("gram"))
      .withColumn("bucket", bucket(col("gram"), nBuckets))
      .drop("gram")
      .localCheckpoint(eager = false)
    val raw = occ.groupBy("bucket").agg(count(lit(1)).as("c_raw"))
    val tgt = occ.filter(col("is_target"))
      .groupBy("bucket").agg(count(lit(1)).as("c_tgt"))
    // Smoothed log-ratio per bucket, quantized to micro-nats. Totals fold
    // in as one-row broadcast aggregates (crossJoin of a single row).
    val totals = occ.agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"))
    val ratio = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round((
          log(coalesce(col("c_tgt"), lit(0L)) + 1) -
          log(col("n_tgt") + nBuckets) -
          log(col("c_raw") + 1) +
          log(col("n_raw") + nBuckets)) * 1e6).cast("long").as("lr_micro"))
    val scores = occ
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_grams"),
        sum(col("lr_micro")).as("score_micro"))
    // K-th (score, id) pair via TakeOrdered; ties at the threshold are all
    // selected (deterministic superset, never a random tie-break).
    val kth = scores
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(topK)
      .agg(min(col("score_micro")).as("thr"))
    scores.crossJoin(broadcast(kth))
      .select(col(idCol), col("n_grams"), col("score_micro"),
        (col("score_micro") >= col("thr")).as("selected"))
  }

  /** DuckDB mirror of [[select]] — identical bucketing, smoothing,
    * quantization, and threshold semantics. */
  def oracleSql(targetPredSql: String, nBuckets: Int = 64,
      topK: Int = 100): String =
    s"""WITH occ AS MATERIALIZED (
       |  SELECT doc_id, ($targetPredSql) AS is_target,
       |    ((strpos('0123456789abcdef', substr(md5(array_to_string(
       |        (string_split(text, ' '))[i:i+1], ' ')), 1, 1)) - 1) * 16 +
       |     (strpos('0123456789abcdef', substr(md5(array_to_string(
       |        (string_split(text, ' '))[i:i+1], ' ')), 2, 1)) - 1))
       |      % $nBuckets AS bucket
       |  FROM documents,
       |    unnest(range(1, len(string_split(text, ' ')))) AS u(i)
       |  WHERE len(string_split(text, ' ')) >= 2),
       |tot AS (SELECT COUNT(*) AS n_raw,
       |          SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_tgt
       |        FROM occ),
       |ratio AS (
       |  SELECT bucket,
       |    CAST(round((ln(COUNT(*) FILTER (WHERE is_target) + 1) -
       |                ln((SELECT n_tgt FROM tot) + $nBuckets) -
       |                ln(COUNT(*) + 1) +
       |                ln((SELECT n_raw FROM tot) + $nBuckets)) * 1e6) AS BIGINT)
       |      AS lr_micro
       |  FROM occ GROUP BY bucket),
       |scores AS (
       |  SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(lr_micro) AS BIGINT) AS score_micro
       |  FROM occ JOIN ratio USING (bucket) GROUP BY occ.doc_id),
       |kth AS (SELECT MIN(score_micro) AS thr FROM (
       |  SELECT score_micro FROM scores
       |  ORDER BY score_micro DESC, doc_id LIMIT $topK))
       |SELECT doc_id, n_grams, score_micro,
       |  score_micro >= (SELECT thr FROM kth) AS selected
       |FROM scores ORDER BY doc_id""".stripMargin
}
