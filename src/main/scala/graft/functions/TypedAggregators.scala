package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` extension point (SURVEY.md §2 UDAF
  * surface): the engine's pattern for aggregations the built-ins don't
  * cover. Buffers are tiny case classes; merge is associative+commutative
  * so Catalyst plans the usual partial (map-side) + final split — the same
  * shuffle shape as a built-in `sum`.
  */
object TypedAggregators {

  case class WeightedBuf(weightedSum: Double, weightSum: Double)

  /** Weighted mean: Σ(v·w) / Σw. The canonical consumer in syscol's domain:
    * a resource-weighted average metric across slaves (cpus-weighted load,
    * /root/reference/syscol/scheduler.go:293-302 gathers the weights). */
  class WeightedMean extends Aggregator[(Double, Double), WeightedBuf, Double] {
    override def zero: WeightedBuf = WeightedBuf(0.0, 0.0)
    override def reduce(b: WeightedBuf, in: (Double, Double)): WeightedBuf =
      WeightedBuf(b.weightedSum + in._1 * in._2, b.weightSum + in._2)
    override def merge(a: WeightedBuf, b: WeightedBuf): WeightedBuf =
      WeightedBuf(a.weightedSum + b.weightedSum, a.weightSum + b.weightSum)
    override def finish(b: WeightedBuf): Double =
      if (b.weightSum == 0.0) Double.NaN else b.weightedSum / b.weightSum
    override def bufferEncoder: Encoder[WeightedBuf] = Encoders.product
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  case class MinMaxBuf(min: Double, max: Double, n: Long)

  /** Range (max - min) with count — a single-pass two-sided extreme. */
  class RangeAgg extends Aggregator[Double, MinMaxBuf, (Double, Long)] {
    override def zero: MinMaxBuf =
      MinMaxBuf(Double.PositiveInfinity, Double.NegativeInfinity, 0L)
    override def reduce(b: MinMaxBuf, v: Double): MinMaxBuf =
      MinMaxBuf(math.min(b.min, v), math.max(b.max, v), b.n + 1)
    override def merge(a: MinMaxBuf, b: MinMaxBuf): MinMaxBuf =
      MinMaxBuf(math.min(a.min, b.min), math.max(a.max, b.max), a.n + b.n)
    override def finish(b: MinMaxBuf): (Double, Long) =
      (if (b.n == 0) Double.NaN else b.max - b.min, b.n)
    override def bufferEncoder: Encoder[MinMaxBuf] = Encoders.product
    override def outputEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  }
}
