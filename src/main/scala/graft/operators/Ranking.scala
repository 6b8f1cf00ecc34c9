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
    * partials; document frequency comes from one window over the term key
    * (same shuffle the df-join would need, without the join-back); the
    * per-doc top-k is a bounded window. Scores are integer micro-units
    * (round(tf·idf·1e6)) so ranking and output are float-order-immune on
    * both engines. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
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
}
