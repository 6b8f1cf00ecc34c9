package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (SURVEY.md §2 B-10 extension): strip
  * lines that repeat across many documents of the SAME source — nav menus,
  * cookie banners, copyright footers — while keeping the unique prose. The
  * standard web-corpus curation step (CCNet/RefinedWeb-style) between HTML
  * stripping and document-level dedup: whole-document dedup never catches a
  * footer shared by a million otherwise-distinct pages, and repeated
  * boilerplate both skews n-gram statistics and leaks into generations.
  *
  * Scale shape (the decontamination discipline, inverted):
  *  1. one line-keyed aggregate computes per-(source, line) document
  *     frequency — map-side partial aggregation, uniform text keys;
  *  2. the boilerplate set (df ≥ minDf) is SMALL by the nature of
  *     boilerplate (a bounded set of templates per site, orders of
  *     magnitude below the line count) and BROADCASTS — the corpus-sized
  *     line table is filtered by a broadcast anti-join, never reshuffled;
  *  3. one doc-keyed aggregate reassembles surviving lines in position
  *     order.
  * Two corpus shuffles total, both on well-distributed keys. If a corpus
  * ever produced a boilerplate set too big to broadcast, dropping the
  * `broadcast` hint degrades gracefully to a shuffle anti-join on the same
  * plan — no logic change.
  */
object Boilerplate {

  /** Remove lines appearing in ≥ `minDf` distinct documents of one source.
    * Returns one row per input document (with non-null text):
    * `(id, n_lines, n_kept, clean_md5)` where `clean_md5` is the digest of
    * the surviving lines rejoined in original order — null when EVERY line
    * was boilerplate (an all-template page carries no content). */
  def strip(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, minDf: Int): DataFrame = {
    require(minDf >= 2, "minDf < 2 would strip every line")
    // Three consumers (df aggregate, anti-join side, totals) and no
    // plan-level CSE in Spark: materialize the line explode once.
    val lines = docs
      .select(col(idCol), col(sourceCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .localCheckpoint(eager = false)
    val hot = lines
      .groupBy(col(sourceCol), col("line"))
      .agg(countDistinct(col(idCol)).as("line_df"))
      .filter(col("line_df") >= minDf)
      .select(col(sourceCol), col("line"))
    val kept = lines.join(broadcast(hot), Seq(sourceCol, "line"), "left_anti")
    val totals = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val cleaned = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      md5(concat_ws("\n", transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")))).as("clean_md5"))
    totals.join(cleaned, Seq(idCol), "left")
  }
}
