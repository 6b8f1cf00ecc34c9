package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Tokenizer-training statistics (SURVEY.md §2 B-10): the corpus-wide
  * counting step that drives BPE vocabulary construction. BPE training is an
  * iterative loop — count adjacent symbol pairs weighted by word frequency,
  * merge the most frequent pair, repeat; the COUNTING step is the only part
  * that touches the corpus, and it is exactly a two-level distributed
  * aggregate. The merge loop itself operates on the (tiny) vocabulary table
  * a driver can iterate.
  *
  * Scale shape: the first aggregate is classic wordcount (map-side partial
  * combine absorbs token skew — "the" is a hot COUNTER, never a hot join
  * key); the pair explode then runs over word TYPES, not tokens — the
  * vocabulary is orders of magnitude smaller than the corpus (~Heaps' law),
  * so the second aggregate is narrow no matter how large the corpus. Top-k
  * lands in TakeOrderedAndProject — no global sort.
  */
object Vocab {

  /** Adjacent character-pair counts over the whitespace vocabulary of
    * `textCol`, weighted by word frequency — the statistics of the first
    * BPE merge iteration (symbols = characters). Returns the `topK` pairs:
    * (pair, cnt = token-weighted occurrences, n_types = distinct word types
    * containing the pair), ordered by (cnt desc, pair).
    *
    * Pair occurrences keep multiplicity within a word ("aaa" contributes
    * "aa" twice), matching the textbook BPE count. One-character words have
    * no adjacent pair and drop out of the pair aggregate (they still count
    * in word frequencies — they simply contain nothing mergeable). */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum("freq").as("cnt"), countDistinct(col("w")).as("n_types"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }
}
