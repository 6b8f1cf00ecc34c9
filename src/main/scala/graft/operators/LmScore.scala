package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram language-model scoring (SURVEY.md §2 B-10): the CCNet-style
  * perplexity-proxy quality signal — score each document by its mean
  * negative log-likelihood under the corpus's own unigram distribution.
  * Rare-token-heavy (or vocabulary-foreign) documents score high; bland
  * high-frequency-token documents score low. Together with the Gopher-style
  * repetition signals (`q_rep_ngram`) and the composite `q_quality_score`
  * this completes the standard pre-training quality-filter battery.
  *
  * Scale shape: the vocabulary is the top-`vocabSize` tokens by corpus
  * count — a bounded table regardless of corpus size, so it BROADCASTS and
  * the token stream never shuffles for the lookup. Out-of-vocabulary tokens
  * get the floor probability 1/total (one-count smoothing at the corpus
  * scale). The only corpus-wide shuffles are the vocabulary count (map-side
  * partial on token) and the per-document aggregate (keyed by doc id — even
  * distribution by construction).
  *
  * Determinism discipline: per-token NLL is rounded to integer MICRO-nats
  * before summing, so the per-document aggregates are exact integer sums —
  * immune to float summation order, which differs between Spark and DuckDB.
  * (`ln` itself is 1-ulp libm arithmetic on both engines; at the 1e-6
  * quantum the flip probability is ~1e-9 per token.)
  */
object LmScore {

  /** Per-document unigram cross-entropy in integer micro-nats.
    * Output: (idCol, n_tokens, n_oov, nll_micro, ce_micro) where
    * nll_micro = Σ round(-ln(p(tok)) · 1e6) and ce_micro = nll_micro DIV
    * n_tokens (integer division — exact on both engines). */
  def unigramCrossEntropy(docs: DataFrame, textCol: String, idCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    // the count table feeds BOTH broadcast subplans (vocab top-V and the
    // one-row total) — materialize it once, or each re-runs the corpus
    // scan+tokenize+aggregate from scratch (no plan-level CSE)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    // one-row total over ALL tokens (not just the kept vocabulary) — the
    // model is the corpus distribution, the cap only bounds the lookup table
    val stats = counts.agg(sum("cnt").as("total"))
    // deterministic top-V: count desc, token asc tie-break
    val vocab = counts.orderBy(desc("cnt"), asc("tok")).limit(vocabSize)
    toks
      .join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        col("cnt").isNull.cast("long").as("oov"),
        round(-log(coalesce(col("cnt"), lit(1L)).cast("double") /
          col("total")) * lit(1000000.0), 0).cast("long").as("nll_u"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum("oov").as("n_oov"),
        sum("nll_u").as("nll_micro"))
      .withColumn("ce_micro", expr("nll_micro DIV n_tokens"))
  }
}
