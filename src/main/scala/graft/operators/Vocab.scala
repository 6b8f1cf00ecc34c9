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

  /** Pointwise-mutual-information co-occurrence pairs — the counting step
    * of GloVe/word2vec-style embedding training: unordered token pairs
    * within a ±`window` token distance, scored by
    * PMI = ln(p(a,b) / (p(a)·p(b))) with p(a,b) = c_ab/T (T = total pair
    * occurrences) and p(a) = c_a/N (N = total tokens). Pairs rarer than
    * `minCount` are dropped (PMI is notoriously noisy at low counts), and
    * the `topK` survivors are returned by (pmi desc, pair).
    *
    * Determinism: PMI is a single ln of a ratio of exact integer counts,
    * rounded to micro-nats — no sum of floats anywhere, so both engines
    * agree to the last digit.
    *
    * Scale shape: pair generation is a zero-shuffle per-row transform
    * (shifted-array zips, exactly like `wordShingles`); the pair aggregate
    * is one shuffle with map-side combine (hot pairs are hot COUNTERS);
    * the unigram-count attach joins are vocabulary-sized equi-joins (AQE
    * broadcasts them when small); top-k lands in TakeOrderedAndProject. */
  def pmiPairs(df: DataFrame, textCol: String, window: Int = 2,
      minCount: Long = 5L, topK: Int = 100): DataFrame = {
    val ws = TextFunctions.tokens(col(textCol))
    val pairCols = (1 to window).map { s =>
      when(size(ws) > s,
        transform(
          arrays_zip(
            slice(ws, lit(1), size(ws) - s).as("x"),
            slice(ws, lit(s + 1), size(ws) - s).as("y")),
          p => struct(
            least(p.getField("x"), p.getField("y")).as("lo"),
            greatest(p.getField("x"), p.getField("y")).as("hi"))))
        .otherwise(array().cast("array<struct<lo:string,hi:string>>"))
    }
    val toks = df.select(explode(ws).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val nTotal = counts.agg(sum("c").as("n"))
    val pairs = df
      .select(explode(flatten(array(pairCols: _*))).as("p"))
      .select(col("p.lo").as("lo"), col("p.hi").as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(eager = false)
    val tTotal = pairs.agg(sum("c_ab").as("t"))
    pairs
      .filter(col("c_ab") >= minCount)
      .join(counts.select(col("tok").as("lo"), col("c").as("c_lo")), "lo")
      .join(counts.select(col("tok").as("hi"), col("c").as("c_hi")), "hi")
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(tTotal))
      .select(col("lo"), col("hi"), col("c_ab"),
        round(log(
          col("c_ab").cast("double") * col("n") * col("n") /
            (col("t").cast("double") * col("c_lo") * col("c_hi"))) *
          lit(1000000.0), 0).cast("long").as("pmi_micro"))
      .orderBy(desc("pmi_micro"), col("lo"), col("hi"))
      .limit(topK)
  }

  /** Corpus → token-id encoding: the final step between a cleaned corpus
    * and a pretraining dataloader. The vocabulary is the corpus's own
    * top-`vocabSize` tokens by (count desc, token) — rank IS the id
    * (1-based; 0 is reserved for OOV/UNK) — and every document becomes its
    * id sequence in token order, serialized as canonical JSON. Returns
    * (id, n_tokens, n_oov, ids_json).
    *
    * Scale shape: the vocabulary build is one wordcount aggregate +
    * TakeOrdered (bounded by `vocabSize` regardless of corpus size); the
    * encode pass explodes tokens WITH positions, left-joins the broadcast
    * vocabulary, and re-assembles per document — one doc-keyed shuffle,
    * with the sort-by-position inside the collected array, never a global
    * sort. */
  def encodeIds(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(vocabSize)
      .select(col("tok"),
        // global row_number AFTER the limit: the input is the already-
        // bounded top-V vocabulary (same class as a one-row broadcast
        // aggregate), so the WindowExec single-partition warning this
        // emits is about ≤ vocabSize rows, never the corpus
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("c"), col("tok"))).cast("long").as("tid"))
    df.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))))
      .withColumnRenamed("col", "tok")
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col(idCol), col("pos"), coalesce(col("tid"), lit(0L)).as("tid"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0, 1L).otherwise(0L)).as("n_oov"),
        to_json(transform(
          sort_array(collect_list(struct(col("pos"), col("tid")))),
          s => s.getField("tid"))).as("ids_json"))
  }

  /** Zipf-law fit per corpus slice: the least-squares slope of
    * ln(frequency) against ln(rank) over each slice's `topK` most frequent
    * tokens — natural text sits near −1; a flat slope flags templated or
    * machine-generated sources, a steep one flags degenerate/repetitive
    * ones. The distribution-health check a data card reports per source.
    *
    * Determinism: ranks and counts are exact integers; ln values are
    * quantized to micro-nat LONGS before any summation, so every aggregate
    * (Σx, Σy, Σxy, Σx²) is exact integer arithmetic — float-order-immune —
    * and the slope is ONE double division of two exact longs, rounded to
    * micro-units. Overflow headroom: |x|,|y| ≤ ~2·10⁷ micro-nats, so
    * n·Σxy ≤ ~10¹⁸ < 2⁶³ at topK = 100.
    *
    * Scale shape: token counting is classic wordcount (map-side combine —
    * hot tokens are hot counters); ranking is a window over the
    * vocabulary-sized count table; the regression aggregate emits one row
    * per slice. */
  def zipfSlope(df: DataFrame, textCol: String, srcCol: String,
      topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df.select(col(srcCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("source").orderBy(desc("c"), col("tok"))
    val ranked = cnt.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("source"),
        round(log(col("rnk").cast("double")) * lit(1000000.0), 0)
          .cast("long").as("x"),
        round(log(col("c").cast("double")) * lit(1000000.0), 0)
          .cast("long").as("y"))
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_ranks"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_ranks"),
        when(col("n_ranks") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("n_ranks") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n_ranks") * col("sxx") - col("sx") * col("sx")) *
            lit(1000000.0), 0).cast("long"))
          .as("slope_micro"))
  }

  /** Heaps'-law vocabulary-growth fit per corpus slice — [[zipfSlope]]'s
    * natural sibling (Heaps 1978; the two laws are duals): distinct word
    * TYPES grow as V(n) ≈ K·n^β with corpus size n, β ≈ 0.4–0.6 for
    * natural text. β near 1 flags unbounded noise vocabularies (random
    * ids, OCR garbage); β near 0 flags templated/boilerplate sources —
    * and a dedup pass that worked SHOWS here as a β drop. The fit: docs
    * process in ascending-id order, cumulative (tokens, types) is sampled
    * at `nCkpt` evenly-spaced document checkpoints, and β is the OLS slope
    * of ln(types) on ln(tokens) over those points (the zipfSlope
    * micro-nat-long discipline — every aggregate exact integer, one final
    * IEEE divide). ln K comes from the same fit (ȳ − β·x̄).
    *
    * Scale shape: ONE token explode read twice (per-(slice, type) first
    * occurrence — vocabulary-bounded; per-doc counts — doc-bounded); the
    * checkpoint table is nCkpt rows per slice and BROADCASTS onto the
    * first-occurrence table (equi-join on slice + a ≤ filter), so the
    * growth curve costs vocab × nCkpt, never corpus × anything. The doc
    * rank/cumsum window partitions by slice over the doc-bounded count
    * table. */
  def heapsLaw(df: DataFrame, textCol: String, idCol: String,
      srcCol: String, nCkpt: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(srcCol).as("source"), col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .localCheckpoint(eager = false) // first-occurrence + per-doc counts
    val firstOcc = toks.groupBy("source", "tok")
      .agg(min("doc").as("first_doc"))
    val wOrd = Window.partitionBy("source").orderBy("doc")
    val ranked = toks.groupBy("source", "doc")
      .agg(count(lit(1)).as("n_tok"))
      .withColumn("rnk", row_number().over(wOrd))
      .withColumn("cum_tok", sum("n_tok")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val nDocs = ranked.groupBy("source").agg(max("rnk").as("n_docs"))
    // the LAST doc of each of the nCkpt equal-width rank buckets is a
    // checkpoint — pure integer bucket arithmetic, no float quantiles
    val ck = ranked.join(nDocs, "source")
      .filter(expr(s"(rnk * $nCkpt) div n_docs > ((rnk - 1) * $nCkpt) div n_docs"))
      .select(col("source"), col("doc").as("ck_doc"), col("cum_tok"),
        expr(s"(rnk * $nCkpt) div n_docs").as("ck"))
    val growth = firstOcc
      .join(broadcast(ck), Seq("source"))
      .filter(col("first_doc") <= col("ck_doc"))
      .groupBy("source", "ck", "cum_tok")
      .agg(count(lit(1)).as("cum_types"))
    val pts = growth.select(col("source"),
      round(log(col("cum_tok").cast("double")) * 1e6, 0).cast("long").as("x"),
      round(log(col("cum_types").cast("double")) * 1e6, 0).cast("long").as("y"))
    pts.groupBy("source")
      .agg(count(lit(1)).as("n_ckpt"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_ckpt"),
        when(col("n_ckpt") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("n_ckpt") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n_ckpt") * col("sxx") - col("sx") * col("sx")) * 1e6, 0)
            .cast("long")).as("beta_micro"),
        when(col("n_ckpt") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("sy").cast("double") -
            ((col("n_ckpt") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (col("n_ckpt") * col("sxx") - col("sx") * col("sx"))) *
              col("sx")) / col("n_ckpt") / 1e6 * 1000.0, 0).cast("long"))
          .as("ln_k_milli"))
  }

  /** Jensen–Shannon divergence between every unordered pair of corpus
    * slices' unigram distributions — the symmetric, bounded (≤ ln 2)
    * corpus-drift distance ([[keyness]] names WHICH tokens drive a drift;
    * this scores HOW FAR two sources sit apart — the monitoring number).
    *
    * JSD(P,Q) = ½ΣP ln(P/M) + ½ΣQ ln(Q/M), M = (P+Q)/2. Tokens present in
    * both slices contribute through the pair join; each slice's EXCLUSIVE
    * probability mass contributes exactly ½·ln2·(1 − Σ_both p) — a closed
    * form on exact integer totals, which removes any need for an outer
    * join over the union vocabulary. Per-token terms are quantized to
    * pico-nat longs before summation (terms are ≤ ½ln2·p — micro would
    * truncate the tail), so the cross-engine sum is exact integer
    * arithmetic; the closed-form exclusive term is one double expression
    * of exact longs.
    *
    * Scale shape: one wordcount aggregate; the pair join is
    * vocabulary-sized per slice pair (slices² × shared vocabulary — slices
    * are few by construction); output is one row per slice pair. */
  def jsDivergence(df: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val cnt = df.select(col(srcCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val tot = cnt.groupBy("source").agg(sum("c").as("n"))
    val a = cnt.select(col("source").as("source_lo"), col("tok"),
      col("c").as("ca"))
    val b = cnt.select(col("source").as("source_hi"), col("tok"),
      col("c").as("cb"))
    val p = col("ca").cast("double") / col("na")
    val q = col("cb").cast("double") / col("nb")
    val m = (p + q) / lit(2.0)
    val both = a.join(b, "tok")
      .filter(col("source_lo") < col("source_hi"))
      .join(broadcast(tot.select(col("source").as("source_lo"),
        col("n").as("na"))), "source_lo")
      .join(broadcast(tot.select(col("source").as("source_hi"),
        col("n").as("nb"))), "source_hi")
      .select(col("source_lo"), col("source_hi"), col("ca"), col("cb"),
        round((p * log(p / m) + q * log(q / m)) * lit(0.5) *
          lit(1000000000000.0), 0).cast("long").as("term_pico"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_common"), sum("ca").as("sa"),
        sum("cb").as("sb"), sum("term_pico").as("tp"))
    // every unordered slice pair, so disjoint-vocabulary pairs (JSD = ln 2)
    // still appear; the tiny totals table provides the frame
    val frame = tot.select(col("source").as("source_lo"), col("n").as("na"))
      .crossJoin(tot.select(col("source").as("source_hi"), col("n").as("nb")))
      .filter(col("source_lo") < col("source_hi"))
    frame.join(both, Seq("source_lo", "source_hi"), "left")
      .select(col("source_lo"), col("source_hi"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round((coalesce(col("tp"), lit(0L)).cast("double") /
          lit(1000000000000.0) +
          lit(0.5 * math.log(2.0)) *
            ((lit(1.0) - coalesce(col("sa"), lit(0L)).cast("double") /
              col("na")) +
             (lit(1.0) - coalesce(col("sb"), lit(0L)).cast("double") /
              col("nb")))) * lit(1000000.0), 0).cast("long")
          .as("jsd_micro"))
  }

  /** Dunning log-likelihood (G²) keyness: per corpus slice (`srcCol`), the
    * `topK` tokens most OVER-represented in that slice against the rest of
    * the corpus — the statistically-grounded upgrade of raw TF-IDF keyword
    * extraction (log-likelihood keyness per Dunning 1993, the standard
    * corpus-comparison statistic: source drift, contamination fingerprints,
    * domain signatures). For token t in slice s:
    * `G² = 2·(a·ln(a·N/(n1·t)) + b·ln(b·N/(n2·t)))` with a = count in s,
    * b = count elsewhere, n1/n2 = slice/rest token totals, t = a + b,
    * N = n1 + n2; zero-count terms contribute 0; only enriched tokens
    * (a/n1 > b/n2) are keyness candidates. G² is computed in double from
    * EXACT integer counts in one fixed formula shape, quantized to
    * micro-units before ranking — cross-engine deterministic.
    *
    * Scale shape: the (source, token) aggregate has map-side combine (hot
    * tokens are hot counters); the token-total attach is a vocabulary-sized
    * self-aggregate + equi-join, never a corpus shuffle; slice totals are a
    * tiny broadcast; per-slice top-k is a window over vocabulary-sized
    * input. */
  def keyness(df: DataFrame, textCol: String, srcCol: String,
      topK: Int = 20, minCount: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = df.select(col(srcCol).as("source"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val a = st.groupBy("source", "tok").agg(count(lit(1)).as("a"))
      .localCheckpoint(eager = false)
    val tokTot = a.groupBy("tok").agg(sum("a").as("t"))
    val srcTot = a.groupBy("source").agg(sum("a").as("n1"))
    val grand = srcTot.agg(sum("n1").as("nn"))
    val g2 = a
      .join(tokTot, "tok")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(grand))
      .withColumn("b", col("t") - col("a"))
      .withColumn("n2", col("nn") - col("n1"))
      // enriched only — EXACT cross-multiplication in decimal(38,0):
      // long×long would overflow at real corpus scale (a ~ 10^7 × n2 ~
      // 10^13 > 2^63) and, with ANSI off, silently flip the comparison
      .filter(col("a") >= minCount &&
        col("a").cast("decimal(18,0)") * col("n2").cast("decimal(19,0)") >
          col("b").cast("decimal(18,0)") * col("n1").cast("decimal(19,0)"))
      .withColumn("term_a",
        col("a") * log(col("a").cast("double") * col("nn") /
          (col("n1").cast("double") * col("t"))))
      .withColumn("term_b",
        when(col("b") > 0,
          col("b") * log(col("b").cast("double") * col("nn") /
            (col("n2").cast("double") * col("t")))).otherwise(lit(0.0)))
      .withColumn("g2_micro",
        round((col("term_a") + col("term_b")) * lit(2000000.0), 0)
          .cast("long"))
    val w = Window.partitionBy("source")
      .orderBy(desc("g2_micro"), col("tok"))
    g2.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("source"), col("rnk").cast("long").as("rnk"), col("tok"),
        col("a"), col("b"), col("g2_micro"))
  }
}
