package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BM25 keyword ranking over a document corpus (SURVEY.md §2 B-10).
  *
  * Scale shape: the token explode is filtered to the (tiny, literal) query
  * vocabulary BEFORE any shuffle, so postings traffic is proportional to
  * query-term occurrences rather than corpus tokens; corpus statistics
  * (N, avgdl) are a one-row broadcast aggregate; the final top-k plans as
  * TakeOrderedAndProject (plan-asserted in PlanSpec), never a global sort.
  *
  * Constants are spelled as decimal literals (2.2 = k1+1, 0.25 = 1−b,
  * k1 = 1.2, b = 0.75) so the engine and the DuckDB oracle parse the same
  * doubles and the 6-dp-rounded scores are bit-comparable.
  */
object Ranking {

  /** Vocabulary-filtered positional postings: one row per (doc, term)
    * with the sorted 0-based token positions. THE single tokenize/filter
    * definition shared by the BM25 scorer and the inverted-index build
    * (`q_doc_index`) — a tokenizer change lands in both or neither, so the
    * index can never desynchronize from the scorer that queries it. The
    * vocabulary filter runs BEFORE any shuffle: postings traffic is
    * proportional to term occurrences, not corpus tokens. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(vocab: _*))
      .groupBy(idCol, "tok")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Lucene-style BM25: idf = ln(1 + (N − df + 0.5)/(df + 0.5)); returns
    * the top `k` of (`idCol`, score) by 6-dp-rounded score with id
    * tie-break. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    val dl = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = postings(docs, idCol, textCol, queryTerms)
      .select(col(idCol), col("tok"),
        size(col("positions")).cast("long").as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(idCol).agg(round(sum("contrib"), 6).as("score"))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
  }

  /** TF-IDF keyword extraction: the top `k` terms per document by
    * tf · ln(N/df), ties broken by term. Where `bm25` ranks documents for a
    * given query, this ranks TERMS within each document — the per-doc
    * keyword/topic signal a corpus index or mixture analysis wants.
    *
    * Scale shape: term frequencies aggregate per (doc, term) with map-side
    * partials; document frequency is a bounded groupBy("tok") aggregate
    * joined back on the term key — NOT a count-over-window on "tok", which
    * would buffer a full postings partition per term and go corpus-sized
    * on Zipf-hot tokens; the per-doc top-k is a bounded window. Scores are
    * integer micro-units (round(tf·idf·1e6)) so ranking and output are
    * float-order-immune on both engines. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(tf.groupBy("tok").agg(count(lit(1)).as("df")), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_u",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")) *
          lit(1000000.0), 0).cast("long"))
    val w = Window.partitionBy(idCol).orderBy(desc("score_u"), asc("tok"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("tok"), col("tf"), col("df"), col("score_u"),
        col("rk"))
  }

  /** Sparse TF-IDF cosine k-NN: text-only similarity search — the
    * embedding-free twin of `Similarity.cosineTopK`. Each document becomes
    * a sparse TF-IDF vector (w = tf · ln(N/df), quantized to integer
    * MILLI-units); dot products run as a posting-list equi-join on the
    * term key, so cost is postings × query-postings on SHARED terms —
    * never an all-pairs product, and the zero-information df = N terms
    * drop out (w = 0) before the join. Integer weights make the dot and
    * norm accumulators exact under ANY aggregation order — the float-sum
    * nondeterminism a SQL SUM would otherwise inject — so the whole
    * operator is oracle-checkable; the only float steps are the final
    * per-candidate division and 6-dp round. Milli (not micro) units on
    * purpose: |w| ≲ tf·idf ≈ 2·10⁵ milli, squares ≤ 4·10¹⁰, a 10⁴-term
    * document's norm ≤ 4·10¹⁴ — int64-safe where micro units would
    * overflow the accumulator.
    *
    * Scale shape: one token explode + per-(doc, term) map-side-partial
    * aggregate; df is a bounded groupBy("tok") aggregate joined back on
    * the term key (a count-over-window on "tok" would buffer a full
    * postings partition per term — corpus-sized for Zipf-hot tokens —
    * exactly the shape the phash group-size reshape removed, so the same
    * bounded-aggregate pattern applies here); the query postings are a
    * bounded broadcast (queries × their vocabulary); the per-query top-k
    * window gets the partial WindowGroupLimit treatment. Returns
    * (q_id, rnk, doc_id, sim). */
  def sparseKnn(docs: DataFrame, idCol: String, textCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryIds.nonEmpty && k >= 1, "need query ids and k >= 1")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("tf"))
    val weighted = tf
      .join(tf.groupBy("tok").agg(count(lit(1)).as("df")), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("w",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")) *
          lit(1000.0), 0).cast("long"))
      .filter(col("w") =!= 0)
      .select("doc", "tok", "w")
      .localCheckpoint(eager = false) // feeds norms + both join sides
    val norms = weighted.groupBy("doc")
      .agg(sum(col("w") * col("w")).as("n2"))
    val qp = weighted.filter(col("doc").isin(queryIds: _*))
      .select(col("doc").as("q_id"), col("tok"), col("w").as("qw"))
    val dots = weighted.join(broadcast(qp), "tok")
      .filter(col("doc") =!= col("q_id"))
      .groupBy("q_id", "doc").agg(sum(col("w") * col("qw")).as("dot"))
    val sims = dots
      .join(norms.select(col("doc").as("q_id"), col("n2").as("qn2")), "q_id")
      .join(norms, "doc")
      .withColumn("sim", round(
        col("dot").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))),
        6))
    val wk = Window.partitionBy("q_id").orderBy(desc("sim"), asc("doc"))
    sims.withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc").as("doc_id"), col("sim"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of ranked
    * retrieval lists — the standard score-free way to combine retrievers
    * whose scores live on incomparable scales (BM25 logits vs cosine):
    * each list contributes `1/(rrfK + rank)` per document, summed. The
    * canonical hybrid-search combiner for dense + sparse retrieval.
    *
    * Contributions are held as `10⁹ div (rrfK + rank)` — EXACT integers,
    * so the fused score is order-immune under any aggregation order and
    * the whole operator is oracle-checkable (floats would make the sum
    * depend on partial-aggregation order). With rrfK = 60 the quantization
    * error vs the real-valued RRF is < 10⁻⁹ per term — far below any
    * rank-separating gap for lists of < 10⁷ entries.
    *
    * Inputs: each list as (q_id, rnk, doc_id), rnk 1-based. Scale shape:
    * one union + one (q_id, doc_id)-keyed sum (map-side partials), then a
    * per-query top-k window (partial WindowGroupLimit) — cost is the sum
    * of list sizes, independent of corpus size. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lists.nonEmpty && k >= 1 && rrfK >= 0,
      s"need lists, k >= 1, rrfK >= 0; got ${lists.size}, $k, $rrfK")
    val all = lists
      .map(_.select(col("q_id"), col("doc_id"),
        expr(s"1000000000L div (${rrfK}L + rnk)").as("contrib")))
      .reduce(_ unionAll _)
    val fused = all.groupBy("q_id", "doc_id")
      .agg(sum("contrib").as("rrf_score"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("q_id").orderBy(desc("rrf_score"), asc("doc_id"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc_id"),
        col("rrf_score"), col("n_lists"))
  }
}
