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

  /** Global token-budget shard planner + manifest — the delivery step
    * between a finished corpus and numbered training files: documents in
    * deterministic `idCol` order fill shard after shard, a new shard
    * opening whenever the GLOBAL running token total crosses a `budget`
    * multiple (assignment by starting offset, so shards may overhang by
    * at most one document — the standard fluid-fill cut). Returns one
    * manifest row per shard: doc count, token total, id range, and an
    * order-immune integer fingerprint (sum of per-doc md5-prefix words) a
    * downstream loader can recompute to detect corruption or drift.
    *
    * The global running sum is the scale trap here, and it is built the
    * only way that survives 100 TB: TWO-PHASE. Phase 1 groups per
    * contiguous id bucket (`idCol div bucketWidth`) into a table of
    * nDocs/bucketWidth rows; the prefix offsets over THAT bounded table
    * are the only single-partition window (the legitimate small-data
    * user, same as the vocab/limit stages). Phase 2 broadcasts the
    * offsets and runs one bounded window PER BUCKET — the corpus itself
    * never funnels through a global sort. A naive
    * `Window.orderBy(id)` would serialize the whole corpus through one
    * reducer; PlanSpec pins its absence. */
  def shardManifest(df: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, bucketWidth: Long = 1000L): DataFrame = {
    require(budget >= 1 && bucketWidth >= 1,
      s"need budget/bucketWidth >= 1, got $budget/$bucketWidth")
    val withBucket = df
      .select(col(idCol), coalesce(col(nTokensCol).cast("long"), lit(0L))
        .as("n_toks"))
      .withColumn("bucket", expr(s"$idCol div $bucketWidth"))
    val bucketTotals = withBucket.groupBy("bucket")
      .agg(sum("n_toks").as("bt"))
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("off", coalesce(sum("bt").over(wB), lit(0L)))
      .select("bucket", "off")
    val wD = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withBucket.join(broadcast(offsets), "bucket")
      .withColumn("end_tok", col("off") + sum(col("n_toks")).over(wD))
      .withColumn("start_tok", col("end_tok") - col("n_toks"))
      .withColumn("shard_id", expr(s"start_tok div $budget"))
    cum.groupBy("shard_id").agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("total_tokens"),
      min(col(idCol)).as("first_id"),
      max(col(idCol)).as("last_id"),
      // 32-bit md5-prefix words summed per shard: order-immune, exact in
      // int64 for any shard a sane budget produces (≤ budget docs × 2³²)
      sum(conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col("n_toks").cast("string"))), 1, 8), 16, 10).cast("long"))
        .as("fingerprint"))
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

  /** Content-defined chunking (CDC): token-level Rabin-style cut points —
    * a token opens a new chunk when its md5 starts with hex '0'
    * (p = 1/16 → ~16-token expected chunks). Because boundaries depend
    * only on LOCAL content, an insertion early in a document re-chunks
    * nothing downstream of the next boundary — the shift-invariance that
    * makes chunk-level storage dedup work, and that fixed-width windows
    * ([[chunkOverlap]]) fundamentally lack. Returns one row per chunk:
    * (id, chunk_id, n_chunk_tokens, chunk_digest).
    *
    * Scale shape: boundary flags are a zero-shuffle projection; chunk ids
    * are one doc-keyed running-sum window; digests aggregate per
    * (doc, chunk) — all keyed on the document, no corpus-wide movement. */
  def cdcChunks(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol))))
      .withColumnRenamed("col", "tok")
      .withColumn("boundary",
        when(substring(md5(col("tok")), 1, 1) === "0", 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("boundary")).over(byDoc))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_chunk_tokens"),
        md5(concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")))).as("chunk_digest"))
  }

  /** Curriculum ordering: score-quantile bucket + deterministic in-bucket
    * shuffle position — the data-ordering step of curriculum training
    * (easy→hard by any per-document score: length, LM perplexity, model
    * quality score). Returns (id, score, bucket ∈ [0, nBuckets), pos =
    * 1-based position within bucket in seeded-md5 order).
    *
    * Bucketing uses exact interpolated percentile BOUNDARIES from a one-row
    * broadcast aggregate — NOT a global ntile window, which would funnel
    * the corpus through one sorting reducer; ties at a boundary land in the
    * lower bucket deterministically. In-bucket positions come from one
    * window per bucket (same per-shard discipline as [[packChunks]] — no
    * global sort ever materializes; `approx_percentile` is the documented
    * 100 TB swap for the boundary aggregate). */
  def curriculumOrder(df: DataFrame, scoreCol: String, idCol: String,
      nBuckets: Int, seed: String = "cur"): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    val bounds = df.agg(array((1 until nBuckets).map(i =>
      percentile(col(scoreCol), lit(i.toDouble / nBuckets))): _*).as("bs"))
    val w = Window.partitionBy("bucket")
      .orderBy(col("shuffle_key"), col(idCol))
    df.select(col(idCol), col(scoreCol))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket",
        size(filter(col("bs"), b => b < col(scoreCol).cast("double")))
          .cast("long"))
      .withColumn("shuffle_key",
        md5(concat(lit(seed), col(idCol).cast("string"))))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("bs", "shuffle_key")
  }
}
