package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (SURVEY.md §2 B-10): documents concatenate in
  * deterministic (shard, id) order and cut into fixed `budget`-token
  * chunks — the data-layout step between a cleaned corpus and a
  * pretraining dataloader.
  *
  * Scale shape: ONE window per shard (the window never crosses shards, so
  * there is no global-order single-partition bottleneck — at 100 TB each
  * shard packs independently, exactly like a per-worker packing job;
  * asserted in PlanSpec).
  */
object Packing {

  /** Adds `end_tok`, `start_tok`, `chunk_id`, `chunk_offset` to `df`:
    * running token totals per `shardCol` in `idCol` order, chunked at
    * `budget` tokens. */
  def packChunks(df: DataFrame, shardCol: String, idCol: String,
      nTokensCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("end_tok", sum(col(nTokensCol)).over(w))
      .withColumn("start_tok", col("end_tok") - col(nTokensCol))
      .withColumn("chunk_id", expr(s"start_tok div $budget"))
      .withColumn("chunk_offset", col("start_tok") % budget)
  }
}
