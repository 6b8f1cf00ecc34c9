package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** RIFF/AVI container parsing — the VIDEO leg of the multimodal decode
  * surface (SURVEY.md §2 B-10), completing the image (BMP/PNG/JPEG) and
  * audio (WAV) parsers. Same philosophy as [[MediaCodec]]: pure JDK byte
  * arithmetic, no codec library, untrusted input decodes to null.
  *
  * AVI is RIFF: `RIFF <size> AVI_` then a chunk list where each element is
  * either a plain chunk (`<id:4> <size:4 LE> <data> [pad to even]`) or a
  * `LIST <size> <type>` container. Video frames are the `##db`/`##dc`
  * chunks (uncompressed / compressed stream data) inside the `LIST movi`
  * container. [[AviFrames]] walks the top level, skips `hdrl`/`JUNK`/
  * anything unknown (real AVIs carry both), finds `movi`, and returns one
  * `(frame_idx, byte_offset, frame_bytes)` struct per video chunk — the
  * REAL version of `Multimodal.sampleFrames`' byte-window slicing, with
  * `byte_offset` the absolute payload offset of the frame data so a
  * downstream range read could fetch a single frame from object storage
  * without touching the rest of the asset.
  *
  * The per-frame payload bytes stay OPAQUE (they are whatever codec the
  * stream declares — decoding them is the inner-codec problem the image
  * kernels solve for stills). Frame extraction is a narrow per-row
  * projection + explode: no shuffle, frames inherit the payload
  * partitioning.
  */
object AviCodec {

  val FrameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("byte_offset", LongType),
    StructField("frame_bytes", BinaryType)))

  /** Untrusted-header caps: a crafted chunk count or frame size must bound
    * allocation before it happens. 4096 frames × 1 MiB ≫ the thumbnail-
    * scale assets this expression path serves. */
  val MaxFrames = 4096
  val MaxFrameBytes: Int = 1 << 20

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int, s: String): Boolean =
    b(off) == s.charAt(0).toByte && b(off + 1) == s.charAt(1).toByte &&
      b(off + 2) == s.charAt(2).toByte && b(off + 3) == s.charAt(3).toByte

  /** True for `##db` / `##dc` video-frame chunk ids (two stream-number
    * digits + the data-type suffix); audio (`##wb`) and index chunks are
    * not frames. */
  private def isVideoFrame(b: Array[Byte], off: Int): Boolean = {
    val d0 = b(off); val d1 = b(off + 1)
    val suf0 = b(off + 2); val suf1 = b(off + 3)
    d0 >= '0' && d0 <= '9' && d1 >= '0' && d1 <= '9' &&
      (suf0 == 'd' && (suf1 == 'b' || suf1 == 'c'))
  }

  /** Walk an AVI payload → frames, or null for anything malformed. */
  def parseFrames(avi: Array[Byte]): GenericArrayData =
    try {
      if (avi.length < 12 || !fourcc(avi, 0, "RIFF") || !fourcc(avi, 8, "AVI "))
        return null
      val riffEnd = math.min(avi.length.toLong, 8L + (leInt(avi, 4).toLong & 0xffffffffL))
      val frames = scala.collection.mutable.ArrayBuffer.empty[Any]
      var p = 12L
      while (p + 8 <= riffEnd) {
        val sz = leInt(avi, p.toInt + 4).toLong & 0xffffffffL
        if (p + 8 + sz > riffEnd) return null // chunk walks past the buffer
        if (fourcc(avi, p.toInt, "LIST") && sz >= 4 &&
          fourcc(avi, p.toInt + 8, "movi")) {
          // Inner walk over the movi payload.
          var q = p + 12
          val end = p + 8 + sz
          while (q + 8 <= end) {
            val fsz = leInt(avi, q.toInt + 4).toLong & 0xffffffffL
            if (q + 8 + fsz > end) return null
            if (isVideoFrame(avi, q.toInt)) {
              if (fsz > MaxFrameBytes || frames.length >= MaxFrames) return null
              frames += InternalRow(frames.length, q + 8,
                java.util.Arrays.copyOfRange(avi, (q + 8).toInt, (q + 8 + fsz).toInt))
            }
            q += 8 + fsz + (fsz & 1) // chunks pad to even offsets
          }
        }
        p += 8 + sz + (sz & 1)
      }
      new GenericArrayData(frames.toArray)
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Build a minimal-but-honest AVI around `n` video frames of `frameLen`
    * bytes sliced from `src`: RIFF/AVI_ signature, a `LIST hdrl` holding a
    * 56-byte `avih` main header with real frame count and size fields, a
    * `JUNK` chunk (ubiquitous in real AVIs — forces parsers to skip
    * unknowns), and the `LIST movi` with one `00db` chunk per frame.
    * Layout is deterministic, so frame offsets are closed-form:
    * `100 + 12 + k*(8+frameLen+pad) + 8` — cross-checked by the oracle. */
  def encodeFrames(src: Array[Byte], frameLen: Int, n: Int): Array[Byte] = {
    require(frameLen > 0 && n > 0 && n <= MaxFrames && frameLen <= MaxFrameBytes)
    require(src.length >= frameLen * n, "short frame source")
    val pad = frameLen & 1
    val bb = java.nio.ByteBuffer.allocate(
      12 + (8 + 4 + 8 + 56) + (8 + 4) + (8 + 4) + n * (8 + frameLen + pad))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(bb.capacity() - 8); cc("AVI ")
    cc("LIST"); bb.putInt(4 + 8 + 56); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(40000)            // dwMicroSecPerFrame: 25 fps
    bb.putInt(0); bb.putInt(0)  // dwMaxBytesPerSec, dwPaddingGranularity
    bb.putInt(0x10)             // dwFlags: AVIF_HASINDEX clear, interleaved
    bb.putInt(n)                // dwTotalFrames
    bb.putInt(0); bb.putInt(1)  // dwInitialFrames, dwStreams
    bb.putInt(frameLen)         // dwSuggestedBufferSize
    bb.putInt(frameLen); bb.putInt(1) // dwWidth, dwHeight (1 row of bytes)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // dwReserved
    cc("JUNK"); bb.putInt(4); bb.putInt(0)
    cc("LIST"); bb.putInt(4 + n * (8 + frameLen + pad)); cc("movi")
    var k = 0
    while (k < n) {
      cc("00db"); bb.putInt(frameLen)
      bb.put(src, k * frameLen, frameLen)
      if (pad == 1) bb.put(0.toByte)
      k += 1
    }
    bb.array()
  }
}

/** `binary (AVI container) → array<struct<frame_idx, byte_offset,
  * frame_bytes>>`, null for malformed input. */
case class AviFrames(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(AviCodec.FrameSchema, containsNull = false)
  override def prettyName: String = "avi_frames"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AviCodec.parseFrames(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): AviFrames =
    copy(child = newChild)
}

/** `binary (frame source bytes) → binary (complete AVI)` with `nFrames`
  * frames of `frameLen` bytes each. */
case class AviEncodeFrames(child: Expression, frameLen: Int, nFrames: Int)
  extends UnaryExpression with CodegenFallback {
  require(frameLen > 0 && nFrames > 0 && nFrames <= AviCodec.MaxFrames &&
    frameLen <= AviCodec.MaxFrameBytes, "avi_encode_frames params out of range")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avi_encode_frames"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < frameLen * nFrames) null
    else AviCodec.encodeFrames(bytes, frameLen, nFrames)
  }

  override protected def withNewChildInternal(newChild: Expression): AviEncodeFrames =
    copy(child = newChild)
}
