package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — the
  * similarity-search building blocks (SURVEY.md §2 B-10).
  *
  * All accumulation is left-to-right in double, so results are deterministic
  * and match an oracle that does the same (DuckDB list_sum/list_transform).
  * At 100 TB these expressions run inside WholeStageCodegen against the
  * column batch — no JVM-object boxing per element beyond the array decode.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² in double (self-dot). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe for zero vectors (returns null via /0). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance in double. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v))
}
