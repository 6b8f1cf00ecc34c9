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

  /** Lucene-style BM25: idf = ln(1 + (N − df + 0.5)/(df + 0.5)); returns
    * the top `k` of (`idCol`, score) by 6-dp-rounded score with id
    * tie-break. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    val dl = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
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
}
