package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination (SURVEY.md §2 B-10): remove training documents
  * that share any word n-gram with an evaluation set — the standard
  * train/eval overlap gate before pretraining.
  *
  * Scale shape: the eval shingle set is tiny against a 100 TB train corpus
  * and BROADCASTS; the train side is one narrow shingle explode + broadcast
  * join + distinct on flagged ids — the corpus itself never shuffles.
  */
object Decontaminate {

  /** Distinct `idCol` values of `train` documents sharing at least one word
    * `n`-gram with any `eval` document. */
  def contaminatedIds(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val evalShingles = eval
      .select(explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("g"))
      .distinct()
    train
      .select(col(idCol),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
          .as("g"))
      .join(broadcast(evalShingles), "g")
      .select(idCol).distinct()
  }

  /** [[contaminatedIds]] with a BLOOM GATE for eval sets too big to
    * broadcast exactly: a Bloom filter over the eval shingle set (xxhash64
    * keys; ~1.2 bytes/item at 1% fpp vs tens of bytes per shingle string)
    * broadcasts in place of the set itself, every train shingle probes it
    * locally, and only the survivors — true matches plus the fpp-sized
    * false-positive trickle — enter the EXACT verify semi-join. Bloom
    * filters have no false negatives, so the output is bit-identical to
    * [[contaminatedIds]]: the sketch changes bandwidth, never the answer.
    *
    * 100 TB shape: decontaminating against a large benchmark union (10⁸+
    * shingles) makes the exact broadcast the bottleneck — the bloom is
    * ~100× smaller at 1% fpp, the probe is a per-row no-shuffle filter on
    * the full train stream, and the verify join shuffles only ~fpp of the
    * corpus' shingles. */
  def contaminatedIdsBloom(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int, expectedItems: Long = 1000000L,
      numBits: Long = 8000000L): DataFrame = {
    val evalShingles = eval
      .select(explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("g"))
      .distinct()
      .localCheckpoint(eager = false) // feeds both the sketch and the verify
    // the sketch rides into every probe as a SCALAR SUBQUERY (evaluated
    // once, inlined as a constant) — the same mechanism Spark's runtime
    // bloom-filter injection uses, and what might_contain requires
    val bloom = graft.functions.SketchFunctions.scalarOf(
      evalShingles.agg(graft.functions.SketchFunctions
        .bloomFilterAgg(xxhash64(col("g")), expectedItems, numBits).as("bf")))
    train
      .select(col(idCol),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
          .as("g"))
      .filter(graft.functions.SketchFunctions
        .mightContain(bloom, xxhash64(col("g"))))
      .join(evalShingles, Seq("g"), "left_semi") // exact verify of survivors
      .select(idCol).distinct()
  }

  /** Per-document n-gram NOVELTY against a reference corpus: of each train
    * document's distinct word n-grams, how many already occur anywhere in
    * `reference` — the distribution-shift / memorization-risk profile of an
    * incoming source (contaminatedIds answers "does it overlap AT ALL";
    * this answers "how much"). Returns
    * (id, n_shingles, n_known, novelty_micro = ⌊(1 − known/total)·10⁶⌋ as
    * an integer micro-ratio, null for shingle-less documents — no evidence
    * either way).
    *
    * Scale shape: identical to decontamination — the reference shingle set
    * broadcasts (bloom-gate it via [[contaminatedIdsBloom]]'s pattern past
    * broadcast size), the train corpus contributes one narrow shingle
    * stream, and both aggregates key on the document id. */
  def noveltyStats(train: DataFrame, reference: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val refShingles = reference
      .select(explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("g"))
      .distinct()
    val trainShingles = train
      .select(col(idCol),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
          .as("g"))
      .localCheckpoint(eager = false)
    val totals = trainShingles.groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"))
    val known = trainShingles
      .join(broadcast(refShingles), Seq("g"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_known"))
    train.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(known, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(col("n_shingles") > 0,
          floor((lit(1.0) - coalesce(col("n_known"), lit(0L)).cast("double") /
            col("n_shingles")) * lit(1000000.0)).cast("long"))
          .as("novelty_micro"))
  }

  /** The committed set of contaminated doc ids an S26 streaming gate has
    * flagged so far (`<gateDir>/contaminated/delta=<batchId>` written by
    * `Streams.decontaminateSinkBatch`), folded base and live deltas
    * alike — the read side a downstream training-set filter anti-joins
    * against. Distinct: the same doc can be re-flagged across batches
    * and across a fold boundary; the SET is the contract. */
  def contaminatedStoreIds(spark: org.apache.spark.sql.SparkSession,
      gateDir: String): DataFrame =
    DeltaStore.snapshotPureDelta(spark, s"$gateDir/contaminated")
      .map(_.select("doc_id").distinct())
      .getOrElse {
        import spark.implicits._
        Seq.empty[Long].toDF("doc_id")
      }

  /** Fold the committed contamination deltas below `uptoBatch` into one
    * base generation — the S26 member of the delta-store compaction
    * family (see [[Dedup.compactSignatureStore]] for the full contract:
    * atomic manifest publish, snapshot-isolated concurrent readers,
    * grace GC one cycle later, `uptoBatch` capped at the stream's last
    * committed batch id so a checkpoint replay never races its own
    * folded delta). */
  def compactContaminatedStore(spark: org.apache.spark.sql.SparkSession,
      gateDir: String, uptoBatch: Long,
      midCompactionHook: () => Unit = () => ()): Unit =
    DeltaStore.compactPureDelta(spark, s"$gateDir/contaminated", uptoBatch,
      midCompactionHook)
}
