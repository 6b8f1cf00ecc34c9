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

  /** Per-document BIGRAM cross-entropy in integer micro-nats — the
    * conditional-probability upgrade of [[unigramCrossEntropy]] (the
    * KenLM-shaped CCNet filter scores with exactly this quantity, one order
    * higher): each adjacent token pair (a b) costs −ln p(b|a) where
    * p(b|a) = c(a b) / Σ_x c(a x) is the corpus's own bigram MLE. The
    * lookup table keeps the top-`vocabSize` bigrams (with their exact
    * context totals — computed over ALL bigrams, the cap only bounds the
    * broadcast table); out-of-vocabulary pairs are floored at 1/total like
    * the unigram model.
    *
    * Scale shape mirrors the unigram operator: bigram counts are one
    * shuffle with map-side partial combine, the context totals and top-V
    * table derive from that (vocabulary-sized) count table, the lookup
    * BROADCASTS, and the corpus stream shuffles only for the per-document
    * aggregate. Documents with fewer than 2 tokens have no bigrams and
    * report (0, 0, 0, null) rather than silently vanishing. */
  def bigramCrossEntropy(docs: DataFrame, textCol: String, idCol: String,
      vocabSize: Int): DataFrame = {
    val bigrams = docs.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), 2)).as("bg"))
    // feeds the context totals, the top-V table, and the one-row total
    val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c2"))
      .localCheckpoint(eager = false)
    val total = c2.agg(sum("c2").as("total2"))
    // exact context totals c1(a) = Σ_x c2(a x), from the count table — a
    // vocabulary-sized aggregate, never a second corpus pass
    val ctx = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"))
    val vocab = c2
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, "w1")
      .orderBy(desc("c2"), asc("bg")).limit(vocabSize)
      .select("bg", "c2", "c1")
    val scored = bigrams
      .join(broadcast(vocab), Seq("bg"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        col("c2").isNull.cast("long").as("oov"),
        round(-log(
          when(col("c2").isNotNull,
            col("c2").cast("double") / col("c1"))
            .otherwise(lit(1.0) / col("total2"))) * lit(1000000.0), 0)
          .cast("long").as("nll_u"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum("oov").as("n_oov"),
        sum("nll_u").as("nll_micro"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
      .withColumn("ce_micro",
        when(col("n_bigrams") > 0, expr("nll_micro DIV n_bigrams")))
  }

  /** Per-document bigram cross-entropy under a KNESER–NEY smoothed LM
    * trained on a REFERENCE slice (Kneser & Ney 1995; Chen & Goodman 1999
    * found absolute discounting with continuation counts the best bigram
    * smoother) — the in-domain perplexity filter: score the whole corpus
    * under a small trusted-domain LM and keep what it finds predictable.
    * Unlike [[bigramCrossEntropy]]'s MLE-with-floor on its own corpus,
    * the train/score split makes genuinely unseen events the NORMAL case,
    * which is exactly what KN's continuation mass is for:
    *
    *   p(w2|w1) = (c2 − D)/c1 + D·N₁₊(w1·)/c1 · p_cont(w2)   (pair seen)
    *            = D·N₁₊(w1·)/c1 · p_cont(w2)                  (context seen)
    *            = p_cont(w2)                                  (context unseen)
    *   p_cont(w2) = N₁₊(·w2)/N₁₊(··), with unseen w2 given
    *   continuation count 1 (the +1 floor, defined semantics).
    *
    * D = dMilli/1000 (default 0.75). Per-bigram −ln(p) is rounded to
    * micro-nats BEFORE the per-doc sum (order-immune, the jsDivergence
    * discipline); every probability is a double computed from exact
    * integer counts in one mirrored expression, so the whole score is
    * cross-engine exact.
    *
    * Scale shape: count tables are VOCABULARY-sized (one bigram aggregate
    * on the train slice, two derived group-bys); scoring is three
    * equi-joins on bg/w1/w2 keys — left to AQE (broadcast when the vocab
    * fits, shuffle join with skew-split on Zipf-hot tokens when not) —
    * plus the per-doc aggregate. Short docs report (0, 0, 0, null). */
  def knBigramCrossEntropy(docs: DataFrame, train: DataFrame,
      textCol: String, idCol: String, dMilli: Int = 750): DataFrame = {
    val (c2t, ctx, cont, tot) = knCounts(train, textCol)
    knScore(docs, textCol, idCol, c2t, ctx, cont, tot, dMilli)
  }

  /** The KN count tables of a train slice: (bigram counts, context stats,
    * continuation counts, one-row total). Everything [[knScore]] needs —
    * and everything [[writeLmLayout]] persists. */
  def knCounts(train: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val c2t = train
      .select(explode(TextFunctions.wordShingles(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
      .localCheckpoint(eager = false) // feeds ctx, cont, tot, and the join
    val ctx = c2t.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"), count(lit(1)).as("nfwd"))
    val cont = c2t.groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("nrev"))
    val tot = c2t.agg(count(lit(1)).as("n1all"))
    (c2t, ctx, cont, tot)
  }

  /** Persist the KN count tables at rest: train ONCE, score any corpus
    * forever without re-aggregating the reference slice — the production
    * LM-filter shape (the reference LM is a versioned artifact, not a
    * per-run recomputation), and the LM sibling of `writeIvfLayout`/
    * `writePqLayout`. Four parquet tables under `path`; counts are
    * exact integers, so a stored-and-reloaded LM scores BIT-IDENTICALLY
    * to a fresh fit (LayoutSpec asserts it). */
  /** DuckDB CTE chain computing the per-document KN bigram score table
    * `per(doc_id, n_bigrams, n_unseen, nll_micro)` — the shared oracle
    * head of `q_kn_bigram` (which LEFT JOINs it back to documents) and
    * `q_ppl_filter` (which bands on ce = nll/n_bigrams per source). One
    * generator so the two oracles can never drift from each other. */
  val knPerDocOracleCtes: String =
    """arr AS (
      |  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      |tb AS (
      |  SELECT array_to_string(a[i:i+1], ' ') AS bg
      |  FROM arr, unnest(range(1, len(a))) AS r(i)
      |  WHERE len(a) >= 2 AND doc_id % 10 = 0),
      |c2 AS (SELECT bg, COUNT(*) AS c2 FROM tb GROUP BY bg),
      |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c2) AS c1,
      |    COUNT(*) AS nfwd FROM c2 GROUP BY 1),
      |cont AS (SELECT split_part(bg, ' ', 2) AS w2, COUNT(*) AS nrev
      |  FROM c2 GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n1all FROM c2),
      |sb AS (
      |  SELECT doc_id, array_to_string(a[i:i+1], ' ') AS bg
      |  FROM arr, unnest(range(1, len(a))) AS r(i)
      |  WHERE len(a) >= 2),
      |sc AS (
      |  SELECT doc_id,
      |    CASE WHEN c2.bg IS NULL THEN 1 ELSE 0 END AS unseen,
      |    CAST(round(-ln(
      |      CASE WHEN ctx.c1 IS NOT NULL THEN
      |        (COALESCE(c2.c2, 0.75) - 0.75) / ctx.c1
      |          + (0.75 * ctx.nfwd / ctx.c1)
      |            * (COALESCE(cont.nrev, 1) / CAST(n1all AS DOUBLE))
      |      ELSE COALESCE(cont.nrev, 1) / CAST(n1all AS DOUBLE) END
      |      ) * 1000000.0) AS BIGINT) AS nll_u
      |  FROM sb
      |  LEFT JOIN c2 USING (bg)
      |  LEFT JOIN ctx ON split_part(sb.bg, ' ', 1) = ctx.w1
      |  LEFT JOIN cont ON split_part(sb.bg, ' ', 2) = cont.w2
      |  CROSS JOIN tot),
      |per AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(unseen) AS n_unseen,
      |    CAST(SUM(nll_u) AS BIGINT) AS nll_micro
      |  FROM sc GROUP BY doc_id)""".stripMargin

  def writeLmLayout(train: DataFrame, textCol: String, path: String): Unit = {
    val (c2t, ctx, cont, tot) = knCounts(train, textCol)
    c2t.write.mode("overwrite").parquet(s"$path/c2")
    ctx.write.mode("overwrite").parquet(s"$path/ctx")
    cont.write.mode("overwrite").parquet(s"$path/cont")
    tot.write.mode("overwrite").parquet(s"$path/tot")
  }

  /** Score `docs` against a stored LM layout — reads the four count
    * tables, never touches the train corpus. */
  def scoreFromLmLayout(docs: DataFrame, textCol: String, idCol: String,
      path: String, dMilli: Int = 750): DataFrame = {
    val s = docs.sparkSession
    knScore(docs, textCol, idCol,
      s.read.parquet(s"$path/c2"), s.read.parquet(s"$path/ctx"),
      s.read.parquet(s"$path/cont"), s.read.parquet(s"$path/tot"), dMilli)
  }

  /** KN scoring against explicit count tables — see
    * [[knBigramCrossEntropy]] for the formula and discipline. */
  private def knScore(docs: DataFrame, textCol: String, idCol: String,
      c2t: DataFrame, ctx: DataFrame, cont: DataFrame, tot: DataFrame,
      dMilli: Int): DataFrame = {
    require(dMilli > 0 && dMilli < 1000, s"discount must be in (0,1): $dMilli")
    val d = dMilli / 1000.0
    val p =
      when(col("c1").isNotNull,
        (coalesce(col("c2"), lit(d)).cast("double") - d) / col("c1") +
          (lit(d) * col("nfwd") / col("c1")) * col("pc"))
        .otherwise(col("pc"))
    val scored = docs
      .select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(c2t, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("pc",
        coalesce(col("nrev"), lit(1L)).cast("double") / col("n1all"))
      .select(col(idCol),
        col("c2").isNull.cast("long").as("unseen"),
        round(-log(p) * lit(1000000.0), 0).cast("long").as("nll_u"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("unseen").as("n_unseen"),
        sum("nll_u").as("nll_micro"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
      .withColumn("ce_micro",
        when(col("n_bigrams") > 0, expr("nll_micro DIV n_bigrams")))
  }
}
