package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** FNV-1a 32-bit digest of a binary column, byte-for-byte the reference
  * producer's keyed-partitioner hash
  * (/root/reference/Godeps/_workspace/src/github.com/elodina/siesta-producer/partitioner.go:27-44:
  * `fnv.New32a()` over the encoded key, reinterpreted as signed int32).
  *
  * Returns the hash as a signed 32-bit int — the exact bit pattern of Go's
  * `int32(hasher.Sum32())`; Java's wrapping int multiply reproduces Go's
  * uint32 modular arithmetic bit-exactly. The abs-and-modulo partition step
  * composes on top (graft.functions.HashFunctions.fnvPartition), so the raw
  * hash stays reusable and oracle-checkable on its own.
  *
  * Codegen: a tight per-byte loop inside whole-stage codegen — this hash
  * sits on the keyed-sink hot path (every row of a 100 TB write).
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a32 requires binary input, got ${child.dataType}")
  override def prettyName: String = "fnv1a32"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var h = 0x811c9dc5 // FNV-1a 32-bit offset basis 2166136261
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * 16777619 // FNV 32-bit prime
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |int $h = 0x811c9dc5;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h ^ ($b[$i] & 0xff)) * 16777619;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)
}
