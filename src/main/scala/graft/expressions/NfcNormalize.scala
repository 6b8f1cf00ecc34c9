package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column. Spark has NO built-in
  * unicode normalizer, yet content-hash dedup at corpus scale requires one:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are byte-different,
  * so without canonical normalization exact dedup silently misses
  * equal-looking documents and every digest-keyed operator (dedup,
  * incremental store, hash sampling) fractures on encoding provenance.
  *
  * Genuinely a custom-Expression case (SURVEY.md §4.2 preference order):
  * not composable from built-ins, per-row scalar, no state. Codegen calls
  * the static kernel below — one virtual-call-free invocation per row; the
  * ICU-free `java.text.Normalizer` is deterministic across JVMs (the
  * Unicode NFC tables are versioned with the JDK's Unicode version, and
  * the oracle comparison pins behavior against DuckDB's `nfc_normalize`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string input, got ${child.dataType}")
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.kernel(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize.kernel($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. Two fast
    * paths: pure-ASCII text (virtually all of a real corpus) is NFC by
    * definition and returns the input after a byte scan with ZERO
    * allocation; non-ASCII text pays one String materialization for
    * `Normalizer.isNormalized` (another cheap scan) and allocates a
    * normalized copy only when the text actually needs rewriting. */
  def kernel(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes()
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: already NFC, no allocation at all
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer
      .normalize(str, java.text.Normalizer.Form.NFC))
  }
}
