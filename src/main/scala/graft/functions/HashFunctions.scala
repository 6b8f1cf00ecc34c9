package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.Bridge
import graft.expressions.Fnv1a32

/** Hash-family column functions with reference-exact semantics (SURVEY.md
  * §2 A11). Spark's own `hash`/`xxhash64` are engine-defined; these exist
  * for consumers that need the reference producer's exact placement.
  */
object HashFunctions {

  /** FNV-1a-32 of a binary key, as Go's `int32(fnv.New32a().Sum32())`. */
  def fnv1a32(key: Column): Column =
    Bridge.column(Fnv1a32(Bridge.expression(key)))

  /** Partition assignment exactly as the reference's hash partitioner
    * (/root/reference/Godeps/_workspace/src/github.com/elodina/siesta-producer/partitioner.go:37-42):
    * negate a negative hash, then truncated modulo the partition count.
    * The abs runs in long (no ANSI overflow); this deviates from Go's
    * wrapping int32 negation only for a key hashing to exactly -2^31 AND a
    * non-power-of-two `n` (Go then yields a negative partition — a latent
    * reference bug, probability 2^-32 per key — while this stays in range). */
  def fnvPartition(key: Column, n: Int): Column = {
    val h = fnv1a32(key).cast("long")
    (when(h < 0, -h).otherwise(h) % n).as("part")
  }
}
