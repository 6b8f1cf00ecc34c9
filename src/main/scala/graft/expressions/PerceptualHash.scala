package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Perceptual average-hash (aHash — the classic public block-mean image
  * fingerprint) over an uncompressed 24bpp BMP payload: the image is
  * partitioned into a `gw`×`gh` block grid, each block's mean gray is
  * compared against the GLOBAL mean gray, and the per-block bits pack
  * MSB-first (block 0 = top-left in STORAGE row order = MSB) into a long.
  * Two visually-near images differ in few bits, so near-dup detection is
  * a Hamming band join over the hashes — the image twin of SimHash over
  * text.
  *
  * Integer-exact by construction: gray is the plain channel sum b+g+r
  * (÷3 dropped — monotone in the comparisons), and "block mean > global
  * mean" evaluates as the cross-multiplication
  * `blockSum · nTotalPx > totalSum · nBlockPx` in int64 (blockSum ≤
  * 765·4096² easily fits), so the hash is bit-identical in any engine —
  * DuckDB-oracle-checkable from the same payload bytes. Null for
  * anything that is not a complete BI_RGB 24bpp BMP (the codec-family
  * malformed-input contract), or if `gw`/`gh` exceed the image dims.
  *
  * Same untrusted-input posture as [[MediaCodec]]: header-driven bounds
  * checks before any read, dimension caps, no exceptions escape. */
case class BmpAHash(child: Expression, gw: Int, gh: Int)
  extends UnaryExpression with CodegenFallback {

  require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 64,
    s"aHash grid must fit a 64-bit hash, got ${gw}x$gh")

  override def dataType: DataType = LongType
  override def prettyName: String = "bmp_ahash"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary BMP payload, got ${other.catalogString}")
  }

  private val MaxDim = 4096

  private def leUInt(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
      val off = leUInt(b, 10, 4)
      val w = leUInt(b, 18, 4)
      val h = leUInt(b, 22, 4)
      val bpp = leUInt(b, 28, 2)
      val comp = leUInt(b, 30, 4)
      // off < 54 would alias header bytes as pixel data — reject, per the
      // "null for anything not a complete BI_RGB 24bpp BMP" contract
      if (bpp != 24 || comp != 0 || w <= 0 || h <= 0 ||
        w > MaxDim || h > MaxDim || off < 54 || off > MaxDim) return null
      if (w < gw || h < gh) return null
      val stride = ((w * 3 + 3) / 4) * 4
      if (b.length < off + h * stride) return null
      val nBlocks = gw * gh
      val blockSum = new Array[Long](nBlocks)
      val blockN = new Array[Long](nBlocks)
      var totalSum = 0L
      var y = 0L
      while (y < h) {
        val by = (y * gh / h).toInt // storage row order, documented
        var x = 0L
        while (x < w) {
          val p = (off + y * stride + x * 3).toInt
          val gray = (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
          val blk = by * gw + (x * gw / w).toInt
          blockSum(blk) += gray
          blockN(blk) += 1
          totalSum += gray
          x += 1
        }
        y += 1
      }
      val nPx = w * h
      var hash = 0L
      var i = 0
      while (i < nBlocks) {
        // block mean > global mean, cross-multiplied — pure int64
        if (blockSum(i) * nPx > totalSum * blockN(i))
          hash |= 1L << (nBlocks - 1 - i)
        i += 1
      }
      hash
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression): BmpAHash =
    copy(child = newChild)
}

/** Windowed 16-bit PCM WAV stats: per `windowSamples`-wide window the
  * sample count, integer energy (Σ sample²) and peak |sample| — one array
  * element per window. The kernel sibling of [[BmpAHash]]: the
  * higher-order-column formulation (aggregate nested inside transform)
  * was measured at 6.5 s over the sf0.1 corpus — interpreted per sample
  * with hex-string byte access — where this eval is a plain byte loop.
  * Null unless the payload is a complete canonical-layout PCM-16 WAV
  * (same header contract as `Multimodal.wavPcmStats`); malformed input
  * can never throw. */
case class WavWindowStats(child: Expression, windowSamples: Int)
  extends UnaryExpression with CodegenFallback {

  require(windowSamples >= 1, "windowSamples must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("win_idx", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("max_abs", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "wav_window_stats"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary WAV payload, got ${other.catalogString}")
  }

  private def leUInt(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (b.length < 45 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E' || b(36) != 'd' || b(37) != 'a' || b(38) != 't' ||
        b(39) != 'a') return null
      val fmt = leUInt(b, 20, 2)
      val bits = leUInt(b, 34, 2)
      val dataSize = leUInt(b, 40, 4)
      if (fmt != 1 || bits != 16 || dataSize <= 0 ||
        b.length < dataSize + 44) return null
      val n = (dataSize / 2).toInt
      val nWin = (n + windowSamples - 1) / windowSamples
      val rows = new Array[Any](nWin)
      var w = 0
      while (w < nWin) {
        val lo = w * windowSamples
        val hi = math.min(lo + windowSamples, n) - 1
        var sq = 0L
        var pk = 0L
        var i = lo
        while (i <= hi) {
          val u = (b(44 + 2 * i) & 0xff) | ((b(45 + 2 * i) & 0xff) << 8)
          val sv = if (u < 32768) u.toLong else u - 65536L
          sq += sv * sv
          if (math.abs(sv) > pk) pk = math.abs(sv)
          i += 1
        }
        rows(w) = org.apache.spark.sql.catalyst.InternalRow(
          w.toLong, (hi - lo + 1).toLong, sq, pk)
        w += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(
      newChild: Expression): WavWindowStats = copy(child = newChild)
}
