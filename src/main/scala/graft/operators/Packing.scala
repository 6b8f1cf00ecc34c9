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

  /** Overlapping (strided) per-document chunking — the RAG/indexing cut,
    * complementing `packChunks`' cross-document concatenation: each
    * document yields windows of `size` tokens starting every `stride`
    * tokens, the last window clipped to the document end. A document
    * shorter than `size` yields exactly one (full-document) chunk; every
    * token lands in ≥ 1 chunk and consecutive chunks overlap by
    * `size − stride` tokens.
    *
    * Scale shape: pure per-row sequence + explode — NO shuffle at all; the
    * chunk list inherits the document partitioning. Output rows per doc =
    * ceil(max(n − size, 0) / stride) + 1, bounded and predictable. */
  def chunkOverlap(df: DataFrame, idCol: String, nTokensCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    // a NULL token count would otherwise fabricate a phantom full-size
    // chunk (least/greatest skip nulls): treat unknown as empty — one
    // zero-token chunk, same as an n=0 document
    val n = coalesce(col(nTokensCol).cast("long"), lit(0L))
    // last start = the smallest multiple of `stride` >= n - size (so the
    // final chunk always reaches the document end), 0 for docs shorter
    // than one window; sequence bounds are inclusive
    val lastStart = lit(stride.toLong) *
      ceil(greatest(n - size, lit(0L)).cast("double") / stride).cast("long")
    df.withColumn("start_tok",
        explode(sequence(lit(0L), lastStart, lit(stride.toLong))))
      .withColumn("end_tok", least(col("start_tok") + size, n))
      .withColumn("chunk_idx", expr(s"start_tok div $stride"))
      .withColumn("n_chunk_tokens", col("end_tok") - col("start_tok"))
  }
}
