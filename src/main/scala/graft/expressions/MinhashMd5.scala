package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `numHashes` md5-family MinHash values of a shingle array in ONE pass:
  * `sig[h] = min over shingles g of hex(md5("<firstHash+h>|" + g))`.
  *
  * Bit-identical to the higher-order formulation it replaces
  * (`array_min(transform(sh, g => md5(concat(lit(s"$h|"), g))))` per hash —
  * hex strings compare lexicographically exactly like the underlying digest
  * bytes, since hex encoding is order-preserving), and therefore identical
  * to the DuckDB oracle's `min(md5(h || '|' || g))`. The hash family is
  * md5-by-construction — part of the ORACLE CONTRACT of the md5-banded
  * near-dup operators, not an implementation choice, which is why this
  * kernel keeps md5 rather than switching to a cheaper hash.
  *
  * Why an expression: per (hash, shingle) the HOF form pays an interpreted
  * lambda dispatch, a string concat allocation, a hex encode, and a string
  * min — numHashes separate array traversals per row. This kernel runs one
  * tight loop, reuses one MessageDigest per eval, tracks mins as 16-byte
  * digests (hex-encodes only the per-hash WINNER), and allocates nothing
  * per element beyond the digest call itself. CodegenFallback like
  * [[SimHash64]]: the md5 calls dominate, not expression dispatch. */
case class MinhashMd5(child: Expression, firstHash: Int, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "minhash_md5 needs at least one hash")
  require(firstHash >= 0, "minhash_md5 firstHash must be >= 0")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> argument, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    if (n == 0) return null // min over an empty set is undefined, like array_min
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(numHashes)(h =>
      s"${firstHash + h}|".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < n) {
      val g = shingles.getUTF8String(i).getBytes
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(prefixes(h))
        md.update(g)
        val d = md.digest()
        val cur = mins(h)
        if (cur == null || java.util.Arrays.compareUnsigned(d, cur) < 0)
          mins(h) = d
        h += 1
      }
      i += 1
    }
    val hex = "0123456789abcdef".toCharArray
    new GenericArrayData(mins.map { d =>
      val c = new Array[Char](32)
      var j = 0
      while (j < 16) {
        c(2 * j) = hex((d(j) >> 4) & 0xf)
        c(2 * j + 1) = hex(d(j) & 0xf)
        j += 1
      }
      UTF8String.fromString(new String(c)): Any
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashMd5 =
    copy(child = newChild)
}
