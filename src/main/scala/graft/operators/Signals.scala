package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions}

/** Per-document signal operators for corpus curation (SURVEY.md §2 B-10):
  * character-entropy gibberish detection, deterministic weighted sampling,
  * and hashed-feature linear classifier scoring. All three are
  * oracle-checkable end-to-end: float terms are quantized to integer micro
  * units before any aggregate, and the only "randomness" is a content hash
  * (FNV-1a-32, the same cross-engine-reproducible expression the partition
  * queries already verify byte-for-byte).
  */
object Signals {

  /** Character-entropy gibberish signal: per document, the Shannon entropy
    * (in micro-nats) of its character distribution, plus the distinct-char
    * count. Near-zero entropy = one repeated character (padding/garbage);
    * unusually high entropy = random bytes; natural text sits in a narrow
    * band — the classic cheap screen before expensive model-based scoring.
    *
    * Determinism: each distinct character contributes ONE term
    * round((-(c/n))·ln(c/n)·1e6) computed once from exact integer counts,
    * and the per-document result is an integer SUM of those terms — immune
    * to float summation order on both engines.
    *
    * Scale shape: the position explode is a per-row generate (no shuffle);
    * the (doc, char) aggregate is keyed by doc id × a ≤alphabet-sized char
    * dimension, so partial aggregation collapses it map-side. Documents with
    * empty text keep their row (0 chars, 0 entropy). */
  def charEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val n = length(col(textCol))
    // sequence(1, 0) would DESCEND ([1, 0]) — guard empty text explicitly
    val positions = when(n > 0, sequence(lit(1), n))
      .otherwise(array().cast("array<int>"))
    val perChar = docs
      .select(col(idCol), n.as("n"),
        explode(positions).as("i"), col(textCol).as("_t"))
      .select(col(idCol), col("n"), col("_t").substr(col("i"), lit(1)).as("ch"))
      .groupBy(idCol, "n", "ch")
      .agg(count(lit(1)).as("c"))
    val scored = perChar
      .select(col(idCol), col("n"),
        round((-(col("c").cast("double") / col("n"))) *
          log(col("c").cast("double") / col("n")) * lit(1000000.0), 0)
          .cast("long").as("term_u"))
      .groupBy(idCol, "n")
      .agg(count(lit(1)).as("n_unique_chars"),
        sum("term_u").as("entropy_micro"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n"), lit(0)).cast("long").as("n_chars_text"),
        coalesce(col("n_unique_chars"), lit(0L)).as("n_unique_chars"),
        coalesce(col("entropy_micro"), lit(0L)).as("entropy_micro"))
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis exponential-sort): each row gets the key
    * ln(u)/w where u ∈ (0,1) derives from the row's content hash and w is
    * its weight; the k largest keys ARE a weighted sample without
    * replacement. Content-keyed u makes the "random" draw a pure function
    * of the data — the sample is reproducible across runs, engines, and
    * partitionings, which is what a training-data pipeline needs from its
    * sampling step (resumable, auditable, identical on re-run).
    *
    * u = (|FNV-1a-32(text)| + 0.5) / 2^31 — strictly inside (0,1], so
    * ln(u) is finite; keys are quantized to integer nano units before the
    * top-k, making the selection boundary exact on both engines.
    *
    * Scale shape: one zero-shuffle projection + TakeOrderedAndProject —
    * per-partition top-k, k rows to the driver, no global sort. */
  def weightedSample(df: DataFrame, textCol: String, idCol: String,
      weight: Column, k: Int): DataFrame = {
    val h = HashFunctions.fnv1a32(col(textCol).cast("binary")).cast("long")
    val v = when(h < 0, -h).otherwise(h)
    val u = (v.cast("double") + lit(0.5)) / lit(2147483648.0)
    df.withColumn("w", weight.cast("double"))
      .withColumn("key_nano",
        round(log(u) / col("w") * lit(1000000000.0), 0).cast("long"))
      .orderBy(desc("key_nano"), col(idCol))
      .limit(k)
  }

  /** Hashed-feature linear classifier scoring — the fastText-style shape
    * every model-based quality filter runs at corpus scale: token → hash
    * bucket (feature id), bucket → weight (the trained model, a TINY table
    * that BROADCASTS), document score = mean token weight, decision =
    * sign. The weights here are a deterministic stand-in (a fixed
    * multiplicative-hash ramp in integer micro units) because no trained
    * model ships with the engine — the JOIN SHAPE is the operator: at
    * 100 TB the corpus token stream never shuffles for the lookup, and the
    * per-doc aggregate is the only corpus-wide exchange.
    *
    * All arithmetic is integer (micro-unit weights, integer division for
    * the mean), so the score — and the keep/drop decision — is exact on
    * both engines. */
  def linearScore(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 64): DataFrame = {
    val weights = docs.sparkSession.range(nBuckets).toDF("bucket")
      .select(col("bucket"),
        (col("bucket") * lit(2654435761L) % lit(2000001L) - lit(1000000L))
          .as("w_micro"))
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("bucket",
        HashFunctions.fnvPartition(col("tok").cast("binary"), nBuckets)
          .cast("long"))
      .join(broadcast(weights), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum("w_micro").as("w_sum_micro"))
      // floor division in double, NOT `DIV`: the sum can be negative, and
      // Spark DIV truncates toward zero while SQL `//` floors — floor() in
      // double (exact far below 2^53 here) is the one form both engines
      // compute identically
      .withColumn("score_micro",
        floor(col("w_sum_micro").cast("double") / col("n_tokens"))
          .cast("long"))
      .withColumn("keep", col("score_micro") > 0)
  }

  /** Expected Calibration Error (Naeini et al. 2015; Guo et al. 2017) over
    * (confidence, outcome) pairs — the eval that asks whether a scorer's
    * confidence MEANS anything: bin rows by confidence, compare each bin's
    * mean confidence against its empirical outcome rate, ECE = the
    * n-weighted mean absolute gap. The number that gates "use the
    * classifier's score as a sampling weight" decisions in a curation
    * pipeline (an uncalibrated quality scorer silently distorts the
    * mixture). Everything integer once confidence is milli-quantized:
    * equal-width bins by integer division, per-bin means/rates by
    * truncating division over exact counts, ECE one more integer divide —
    * fully oracle-checkable. One map-side-partial aggregate over the
    * scored frame; bins are nBins rows, the total a broadcast. */
  def calibration(scored: DataFrame, confMilli: Column, outcome: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins must be in [2,1000]: $nBins")
    val width = 1000 / nBins
    val bins = scored
      .select(confMilli.cast("long").as("conf_milli"),
        outcome.cast("long").as("y"))
      .withColumn("bin",
        least(lit(nBins - 1L), expr(s"conf_milli div $width")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("conf_milli").as("cs"),
        sum("y").as("ys"))
      .withColumn("mean_conf_milli", expr("cs div n"))
      .withColumn("acc_milli", expr("(1000 * ys) div n"))
      .withColumn("gap_milli",
        abs(col("mean_conf_milli") - col("acc_milli")))
    bins
      .crossJoin(broadcast(bins.agg(
        sum(col("n") * col("gap_milli")).as("gsum"), sum("n").as("nt"))))
      .select(col("bin"), col("n"), col("mean_conf_milli"),
        col("acc_milli"), col("gap_milli"),
        expr("gsum div nt").as("ece_milli"))
  }
}
