package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Input validation shared by the SQL-registered kernels: these expressions
  * are reachable from arbitrary `spark.sql(...)` via GraftExtensions, so a
  * wrong-typed argument must fail analysis with a readable message, not
  * ClassCastException inside eval/codegen. */
private[expressions] object VectorTypeCheck {
  def numericArrays(name: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float> or array<double> arguments, got " +
        types.map(_.catalogString).mkString(", "))
}

/** Codegen'd dense-vector kernels (SURVEY.md §2 B-10 similarity search).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * semantically right but interpreted per element with no common-
  * subexpression elimination — at 12.5M candidate pairs × 64 dims that is
  * ~2.4G boxed lambda evaluations (measured ~10 s/query at sf0.1). These
  * expressions emit a tight scalar loop into whole-stage codegen instead.
  *
  * Numeric contract: accumulation is left-to-right in double over
  * float/double elements — bit-identical to the higher-order formulation
  * they replace, so the 6-dp-rounded DuckDB oracle comparisons are
  * unaffected.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.numericArrays(prettyName,
      Seq(left.dataType, right.dataType))

  private def elemGetter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case other =>
        throw new IllegalArgumentException(s"unsupported element type $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv: Double = if (isFloatL) x.getFloat(i) else x.getDouble(i)
      val yv: Double = if (isFloatR) y.getFloat(i) else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ga, gb) = (elemGetter(left), elemGetter(right))
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$ga($i);
         |  double $y = (double) $b.$gb($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ in double over float/double arrays — codegen'd. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.numericArrays(prettyName,
      Seq(left.dataType, right.dataType))

  private def elemGetter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case other =>
        throw new IllegalArgumentException(s"unsupported element type $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      val xv: Double = if (isFloatL) x.getFloat(i) else x.getDouble(i)
      val yv: Double = if (isFloatR) y.getFloat(i) else y.getDouble(i)
      dot += xv * yv; i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ga, gb) = (elemGetter(left), elemGetter(right))
      val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over `array<bigint>` micro-unit vectors, accumulated in
  * 64-bit integer arithmetic — the deterministic-quantizer distance. Pure
  * integer math means the value is BIT-IDENTICAL in any engine, which is
  * the property the unrolled DuckDB k-means oracle depends on (same
  * discipline as the PageRank integer rounds). Range: micro-unit
  * embeddings |x| ≤ ~1e7 give per-dim squares ≤ 4e14; 64 dims stay ~2.6e16,
  * far inside int64. Codegen'd: this runs corpus × k times per Lloyd round,
  * the quantizer's hot path. */
case class LongL2Sq(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_l2sq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left.dataType, right.dataType).forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> arguments, got " +
        Seq(left.dataType, right.dataType).map(_.catalogString).mkString(", "))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L; var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d; i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, s, d, i) = (ctx.freshName("n"), ctx.freshName("s"),
        ctx.freshName("d"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongL2Sq =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over a token array: per token, md5; bit i of the
  * signature (MSB-first over the first 8 digest bytes) votes ±1; the sign
  * vector packs into a long. Identical bit layout to the higher-order
  * formulation it replaces (first 16 hex nibbles, MSB-first per nibble),
  * but one tight eval per row instead of tokens×64 interpreted lambdas.
  * CodegenFallback: md5 is an opaque digest call; the per-row cost is the
  * digest itself, not expression dispatch. */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < tokens.numElements()) {
      md.reset()
      val digest = md.digest(tokens.getUTF8String(t).getBytes)
      var i = 0
      while (i < 64) {
        val bit = (digest(i / 8) >> (7 - i % 8)) & 1
        counts(i) += (if (bit == 1) 1 else -1)
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << (63 - i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
