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
}
