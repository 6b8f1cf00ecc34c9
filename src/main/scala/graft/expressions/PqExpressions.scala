package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search" — public method): vectors split into `m`
  * subvectors, each quantized to its nearest codebook centroid, so a
  * d-float vector stores as `m` small integers — with m=4, ks=16 over
  * d=16 floats that is 4 bytes of codes against 64 bytes of floats, the
  * at-rest scan-IO compression that (with IVF cells and SQ8 codes)
  * makes billion-vector search affordable. Queries score codes by
  * ASYMMETRIC DISTANCE COMPUTATION: per query one m×ks table of exact
  * subspace distances to every centroid, then every corpus code costs m
  * table lookups — no per-pair float math at scan time.
  *
  * Both kernels carry the (driver-fitted, seeded) codebooks as literal
  * expression state, the same posture as [[MinhashMd5]]'s hash family —
  * CodegenFallback leaves, narrow per-row projections, no shuffle. */
object PqExpressions {

  /** Squared L2 between a subvector of `v` starting at `off` and
    * centroid `cent`. Each element is WIDENED TO DOUBLE BEFORE the
    * subtraction: a float-precision `d` would round before squaring,
    * diverging from the double-precision SQL oracle on near-ties in the
    * encode argmin or at shortlist boundaries. Double arithmetic
    * throughout makes the engine and the oracle bit-identical. */
  private[expressions] def subDistSq(v: ArrayData, off: Int,
      cent: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < cent.length) {
      val d = v.getFloat(off + i).toDouble - cent(i).toDouble
      s += d * d
      i += 1
    }
    s
  }
}

/** `array<float> (d floats) → array<int> (m codes)`: per subspace the
  * nearest codebook centroid by squared L2, ties to the LOWEST centroid
  * id (deterministic). `codebooks(j)(c)` is centroid c of subspace j. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
  extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one centroid per subspace")

  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    // A null element would read as 0.0f and quantize into silently-wrong
    // codes; follow the codec convention: malformed input → null row.
    var e = 0
    while (e < v.numElements()) {
      if (v.isNullAt(e)) return null
      e += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = codebooks(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val d = PqExpressions.subDistSq(v, j * dsub, cents(c))
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep lowest c
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `array<int> (m codes) → array<double> (one ADC distance per query)`:
  * `tables(q)(j)(c)` is query q's exact squared L2 to centroid c in
  * subspace j, precomputed ONCE per query batch on the driver (queries
  * are the bounded serving batch — the same boundedness the broadcast
  * in the exact top-k already assumes). Per corpus row the kernel does
  * `m` lookups per query; no float subtraction survives to scan time. */
case class PqAdcDistances(child: Expression,
    tables: Array[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {
  require(tables.nonEmpty, "pq_adc needs at least one query table")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_distances"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> codes, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val m = tables(0).length
    if (codes.numElements() != m) return null
    // Null or out-of-range codes are corrupt input, not centroid 0 / a task
    // kill — same malformed-input → null convention as PqEncode.
    var e = 0
    while (e < m) {
      if (codes.isNullAt(e) || codes.getInt(e) < 0 ||
        codes.getInt(e) >= tables(0)(e).length) return null
      e += 1
    }
    val out = new Array[Any](tables.length)
    var q = 0
    while (q < tables.length) {
      val t = tables(q)
      var s = 0.0
      var j = 0
      while (j < m) {
        s += t(j)(codes.getInt(j))
        j += 1
      }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAdcDistances = copy(child = newChild)
}
