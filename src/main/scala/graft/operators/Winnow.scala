package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Winnowing document fingerprints (Schleimer, Wilder & Aiken, SIGMOD 2003 —
  * the MOSS scheme; SURVEY.md §2 B-10 dedup family). Where a MinHash
  * signature summarizes a whole document, winnowing selects POSITIONED local
  * fingerprints with a coverage guarantee: any shared token run of at least
  * `w + k − 1` tokens between two documents is certain to produce at least
  * one shared fingerprint — deterministic recall for long verbatim overlaps
  * (plagiarism spans, mirrored boilerplate), which probabilistic LSH cannot
  * promise.
  *
  * Selection rule: hash every word `k`-gram, slide a window of `w`
  * consecutive hashes, keep each window's minimum; ties break to the
  * LEFTMOST position. (The paper's rightmost rule optimizes expected
  * density; the guarantee itself is tie-break-independent, and leftmost-min
  * is expressible as ONE window `min` — see below.) Expected density is
  * ~2/(w+1) fingerprints per gram.
  *
  * Cross-engine determinism: the gram hash is the md5 family (like the
  * MinHash/fingerprint operators — Spark's Murmur3 `hash` is
  * engine-defined), truncated to 15 hex chars and concatenated with the
  * 7-digit zero-padded gram position. On that fixed-width string,
  * LEXICOGRAPHIC order == (hash, position) order, so a single window `min`
  * over trailing-`w` frames implements min-hash-then-leftmost exactly, in
  * any engine with window functions.
  *
  * Scale shape: one narrow posexplode + one per-document sort window — no
  * joins, no corpus-wide shuffle beyond the doc-keyed window partition (at
  * rest, documents already hash-partition by id; the window never crosses
  * documents). Output is ~2m/(w+1) rows per m-gram document.
  */
object Winnow {

  /** Per-document winnowing fingerprints: (doc_id, fp_pos, fp_hash) for the
    * selected k-gram minima. Documents with fewer than `k` tokens have no
    * grams and produce no rows (no evidence, nothing to match); documents
    * with fewer than `w` grams contribute their single global minimum (the
    * paper's degenerate-window case). */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val grams = df
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.wordShingles(col(textCol), k)))
      // fixed-width md5-prefix + position key: string min == (hash, pos)
      // min. Position is 7 digits — lpad TRUNCATES beyond its width, which
      // would silently corrupt the ordering, so the width must exceed any
      // real document's gram count (10^7 tokens ≈ 40 MB of text; the
      // explicit guard below turns the corruption into an error instead)
      .select(col("doc"), col("pos"),
        concat(substring(md5(col("col")), 1, 15),
          lpad(col("pos").cast("string"), 7, "0")).as("hp"))
      .withColumn("hp",
        when(col("pos") < 10000000, col("hp"))
          .otherwise(raise_error(concat(lit(
            "winnow: document with >= 10^7 grams exceeds the positional " +
              "key width, doc="), col("doc").cast("string")))))
    val byDoc = Window.partitionBy("doc").orderBy("pos")
    val frame = byDoc.rowsBetween(-(w - 1), 0)
    val all = Window.partitionBy("doc")
    grams
      .withColumn("wmin", min(col("hp")).over(frame))
      .withColumn("cnt", count(lit(1)).over(frame))
      .withColumn("m", count(lit(1)).over(all))
      // keep only COMPLETE windows (cnt == w); a document shorter than one
      // window keeps its single all-gram window (cnt == m at the last row)
      .filter(col("cnt") === least(lit(w), col("m")))
      .select(col("doc"), col("wmin")).distinct()
      .select(col("doc"),
        substring(col("wmin"), 16, 7).cast("long").as("fp_pos"),
        substring(col("wmin"), 1, 15).as("fp_hash"))
  }

  /** Document pairs sharing at least `minShared` winnowing fingerprint
    * HASHES (positions differ between documents; the hash set is the
    * match key), with a fingerprint document-frequency guard: hashes
    * present in more than `maxDf` documents are boilerplate and carry no
    * discriminative signal — exactly the stop-shingle discipline of
    * `Dedup.ngramJaccardPairs`, applied to the winnowed residue. Because
    * winnowing already thinned the corpus to ~2/(w+1) of its grams, the
    * pair join runs over a fingerprint table an order of magnitude smaller
    * than the shingle table the exact-Jaccard verifier joins. */
  def sharedFingerprintPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, minShared: Long, maxDf: Long): DataFrame = {
    val fps = fingerprints(df, textCol, idCol, k, w)
      .select(col("doc"), col("fp_hash")).distinct()
      .localCheckpoint(eager = false) // feeds the df-guard and both join sides
    val hot = fps.groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("fp_hash")
    val kept = fps.join(broadcast(hot), Seq("fp_hash"), "left_anti")
    // Same singleton prune as the Jaccard pair join: a fingerprint in ONE
    // document forms no pair, and the df-annotating window shuffles on
    // fp_hash — the exact partitioning+sort the self-join reuses, so the
    // prune adds no exchange. On a Zipf corpus the singleton tail is the
    // bulk of the (already winnow-thinned) fingerprint vocabulary.
    val paired = kept
      .withColumn("kdf", count(lit(1)).over(Window.partitionBy("fp_hash")))
      .filter(col("kdf") >= 2)
      .select("doc", "fp_hash")
    paired.select(col("doc").as("a_id"), col("fp_hash"))
      .join(paired.select(col("doc").as("b_id"), col("fp_hash")), "fp_hash")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
