package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import graft.expressions.MisraGries

/** Fixed-memory sketch aggregates (SURVEY.md §2 B-10 / §4.2 custom-aggregate
  * surface). */
object SketchFunctions {

  /** Misra–Gries heavy-hitter candidates: the sorted list of at most
    * `capacity` values guaranteed to include every value occurring in more
    * than 1/(capacity+1) of the rows. See [[graft.expressions.MisraGries]]
    * for the guarantee and the two-pass exact-recount pattern. */
  def misraGriesCandidates(c: Column, capacity: Int): Column =
    Bridge.column(
      MisraGries(Bridge.expression(c), capacity).toAggregateExpression())

  /** Bloom filter over a LONG column (xxhash64 your keys first), as a binary
    * sketch — Spark's own runtime-filter aggregate, used here as a
    * first-class operator surface. ~1.2 bytes/item at 1% fpp, mergeable,
    * broadcastable: the membership gate for sets too big to broadcast
    * exactly. */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Bridge.column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(Bridge.expression(c),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
  }

  /** Membership probe against [[bloomFilterAgg]]'s sketch: false positives
    * at the configured rate, NEVER false negatives — callers must verify
    * positives exactly when exactness matters. `might_contain` requires its
    * sketch side to be a constant or scalar subquery (the sketch must be
    * evaluable once, not per probe row), so pass the one-row sketch
    * DataFrame through [[scalarOf]]. */
  def mightContain(bloom: Column, c: Column): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(Bridge.expression(bloom), Bridge.expression(c)))

  /** A one-row, one-column DataFrame as a SCALAR SUBQUERY expression — how
    * Spark's own runtime-filter injection feeds a bloom sketch to
    * `might_contain`: the subquery plan runs once, its value inlines into
    * every probe. */
  def scalarOf(df: org.apache.spark.sql.DataFrame): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.queryExecution.analyzed))
}
