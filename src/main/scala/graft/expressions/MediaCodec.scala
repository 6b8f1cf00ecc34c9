package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import java.io.ByteArrayInputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** JDK-only media codecs as Catalyst expressions — the entropy-coded half of
  * the multimodal decode surface (SURVEY.md §2 B-10).
  *
  * `Multimodal.pngPixelStats` decodes the stored-block (compression level 0)
  * PNG case with pure columnar byte arithmetic; these kernels close the rest:
  * a DEFLATE inflate (`java.util.zip.Inflater` — zlib ships in the JDK, no
  * external codec library) plus the five PNG scanline filters give a REAL
  * decode for any zlib-compressed non-interlaced 8-bit PNG, and
  * `javax.imageio` (also JDK: the java.desktop module bundles full PNG and
  * JPEG plugins) covers the entropy-coded JPEG case. The encoder twin exists
  * so a query can round-trip real compressed containers built from per-row
  * bytes — which is what lets the decode path be ORACLE-checked: DuckDB
  * recomputes the channel sums from the raw source bytes while the engine
  * goes source → filter → deflate → chunk/CRC framing → parse → inflate →
  * unfilter and must land on the same integers.
  *
  * All are `CodegenFallback` leaves like [[MinhashMd5]]: the codec call
  * dominates, not expression dispatch. Each is a narrow per-row projection —
  * no shuffle, no UDF registration, inherits the payload partitioning — and
  * every kernel treats its input as UNTRUSTED: any malformed header, chunk
  * walk escape, checksum-stream truncation, or decompression overrun decodes
  * to null rather than throwing (one corrupt record must never kill a
  * 6-hour pipeline), with inflate output capped at exactly the
  * header-declared scanline volume so a crafted bomb cannot allocate beyond
  * the (already dimension-bounded) expectation.
  */
object MediaCodec {

  /** Shared result schema — identical field order to
    * `Multimodal.bmpPixelStats`/`pngPixelStats` so the columnar and codec
    * decoders are drop-in comparable. */
  val StatsSchema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_px", LongType), StructField("sum_r", LongType),
    StructField("sum_g", LongType), StructField("sum_b", LongType)))

  /** Dimension bound shared with `Multimodal.DimBound`'s intent: headers are
    * untrusted, and the bound caps both the pixel loop and the inflate
    * buffer BEFORE any allocation. 2^12 per side (16 M px) is far beyond the
    * thumbnail scale this expression path serves; bigger assets belong on a
    * batch codec anyway (the decode cost per row stops being "narrow"). */
  val MaxDim = 1L << 12

  // imageio's default ImageInputStream is FILE-cache-backed — one temp file
  // per decode call. Memory-cache instead: payloads here are small by the
  // dimension bound, and a per-row disk write would dominate the decode.
  javax.imageio.ImageIO.setUseCache(false)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    val len = data.length
    out(0) = (len >>> 24).toByte; out(1) = (len >>> 16).toByte
    out(2) = (len >>> 8).toByte; out(3) = len.toByte
    val t = tpe.getBytes("US-ASCII")
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, len)
    val crc = new CRC32()
    crc.update(out, 4, 4 + len)
    val c = crc.getValue
    out(8 + len) = (c >>> 24).toByte; out(9 + len) = (c >>> 16).toByte
    out(10 + len) = (c >>> 8).toByte; out(11 + len) = c.toByte
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a complete RGB8 non-interlaced PNG from `w*h*3` raw pixel bytes.
    * Scanline `y` uses filter `(y % 4) + 1` — Sub, Up, Average, Paeth in
    * rotation, so every nontrivial filter appears in any image with ≥4 rows
    * and the decoder's unfilter arithmetic is genuinely exercised (filter
    * None would make the stream a trivial memcpy). The zlib stream is
    * default-compression DEFLATE (dynamic/fixed Huffman — entropy-coded,
    * NOT the stored-block case the columnar decoder handles). Checksums are
    * real (chunk CRC32s and the Deflater's Adler-32). */
  def encodePngRgb8(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim, "bad dims")
    require(pixels.length >= w * h * 3, "short pixel buffer")
    val bpr = w * 3
    val raw = new Array[Byte](h * (1 + bpr)) // filter byte + scanline, per row
    var y = 0
    while (y < h) {
      val f = (y % 4) + 1
      raw(y * (1 + bpr)) = f.toByte
      var i = 0
      while (i < bpr) {
        val cur = pixels(y * bpr + i) & 0xff
        val left = if (i >= 3) pixels(y * bpr + i - 3) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * bpr + i) & 0xff else 0
        val ul = if (i >= 3 && y > 0) pixels((y - 1) * bpr + i - 3) & 0xff else 0
        val pred = f match {
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + bpr) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ false)
    defl.setInput(raw); defl.finish()
    // zlib worst-case bound: 5 bytes per 64 KiB stored block + header/adler;
    // an undersized buffer would spin the drain loop forever on a 0-return.
    val zbuf = new Array[Byte](raw.length + raw.length / 1000 + 64)
    var zlen = 0
    while (!defl.finished()) zlen += defl.deflate(zbuf, zlen, zbuf.length - zlen)
    defl.end()
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (RGB)
    PngSig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Full PNG decode → (width, height, n_px, sum_r, sum_g, sum_b), or null.
    * Handles any non-interlaced 8-bit-depth gray (0), RGB (2), or RGBA (6)
    * PNG at any compression level and any filter mix, IDAT split across any
    * number of chunks. Gray sums land in all three channels; alpha is
    * ignored (stat parity with the RGB view of the same pixels). Null for
    * palette (3) and 16-bit images, interlaced streams, oversized
    * dimensions, or ANY malformed byte — never an exception. */
  def decodePngStats(png: Array[Byte]): InternalRow =
    try {
      if (png.length < 45) return null
      var i = 0
      while (i < 8) { if (png(i) != PngSig(i)) return null; i += 1 }
      if (beInt(png, 8) != 13 || png(12) != 'I' || png(13) != 'H' ||
        png(14) != 'D' || png(15) != 'R') return null
      val w = beInt(png, 16); val h = beInt(png, 20)
      val depth = png(24) & 0xff; val ctype = png(25) & 0xff
      val interlace = png(28) & 0xff
      if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return null
      if (depth != 8 || interlace != 0) return null
      val ch = ctype match {
        case 0 => 1; case 2 => 3; case 6 => 4; case _ => return null
      }
      // Chunk walk: concatenate every IDAT payload; stop at IEND. Offsets
      // are long-checked against the buffer before any read.
      val idat = new java.io.ByteArrayOutputStream()
      var p = 33L
      var done = false
      while (!done) {
        if (p + 8 > png.length) return null
        val len = beInt(png, p.toInt).toLong & 0xffffffffL
        if (len > Int.MaxValue - 8 || p + 12 + len > png.length) return null
        val t0 = png(p.toInt + 4); val t1 = png(p.toInt + 5)
        val t2 = png(p.toInt + 6); val t3 = png(p.toInt + 7)
        if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T')
          idat.write(png, p.toInt + 8, len.toInt)
        else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') done = true
        p += 12 + len
      }
      val bpr = w * ch
      val rawLen = h.toLong * (1 + bpr)
      if (rawLen > Int.MaxValue) return null
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new Inflater()
      var got = 0
      var surplus = false
      try {
        inf.setInput(idat.toByteArray)
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          // Zero progress of ANY kind — truncated input, a preset-dictionary
          // header (FDICT: needsDictionary() with needsInput() false), or any
          // other stall — must bail, never spin: a crafted 2-byte zlib header
          // would otherwise pin a task thread at 100% CPU forever.
          if (n == 0) return null
          got += n
        }
        // The stream must carry EXACTLY the declared scanline volume: a short
        // stream is truncation, surplus is a dimension lie / bomb — both null.
        surplus = !inf.finished() && inf.inflate(new Array[Byte](1)) > 0
      } finally inf.end()
      if (got < raw.length || surplus) return null
      // Unfilter in place, then sum channels.
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        val row = y * (1 + bpr) + 1
        val prior = row - (1 + bpr)
        val f = raw(row - 1) & 0xff
        if (f > 4) return null
        var x = 0
        while (x < bpr) {
          val left = if (x >= ch) raw(row + x - ch) & 0xff else 0
          val up = if (y > 0) raw(prior + x) & 0xff else 0
          val ul = if (x >= ch && y > 0) raw(prior + x - ch) & 0xff else 0
          val v = f match {
            case 0 => raw(row + x) & 0xff
            case 1 => (raw(row + x) + left) & 0xff
            case 2 => (raw(row + x) + up) & 0xff
            case 3 => (raw(row + x) + (left + up) / 2) & 0xff
            case 4 => (raw(row + x) + paeth(left, up, ul)) & 0xff
          }
          raw(row + x) = v.toByte
          ch match {
            case 1 => sr += v; sg += v; sb += v
            case _ => (x % ch) match {
              case 0 => sr += v
              case 1 => sg += v
              case 2 => sb += v
              case _ => // alpha: ignored
            }
          }
          x += 1
        }
        y += 1
      }
      InternalRow(w.toLong, h.toLong, w.toLong * h, sr, sg, sb)
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Generic raster decode via the JDK's own `javax.imageio` readers (PNG,
    * JPEG, BMP, GIF — the java.desktop plugins, present headless). Same
    * stats struct. This is the INDEPENDENT decoder: for PNG it must agree
    * byte-for-byte with [[decodePngStats]] (asserted in the registered
    * query and spec), and it is the only JPEG path — Huffman+DCT entropy
    * decode through a battle-tested JDK codec rather than a reimplementation.
    * Per-row BufferedImage churn makes this the documented batch-codec-seam
    * fallback, not the bulk path; dimensions still bound-checked first via
    * a stream reader so a crafted header cannot allocate a huge raster. */
  def decodeImageStats(bytes: Array[Byte]): InternalRow =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return null }
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val w = reader.getWidth(0); val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return null
        val img = reader.read(0)
        var sr = 0L; var sg = 0L; var sb = 0L
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < px.length) {
          val v = px(i)
          sr += (v >>> 16) & 0xff; sg += (v >>> 8) & 0xff; sb += v & 0xff
          i += 1
        }
        InternalRow(w.toLong, h.toLong, w.toLong * h, sr, sg, sb)
      } finally { reader.dispose(); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** JPEG-encode `w*h*3` RGB bytes through the JDK encoder (default
    * quality). Lossy by nature — the round-trip query checks the LOSSLESS
    * facts (dimensions) exactly and the spec bounds per-pixel error. */
  def encodeJpegRgb8(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim, "bad dims")
    require(pixels.length >= w * h * 3, "short pixel buffer")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, ((pixels(o) & 0xff) << 16) |
          ((pixels(o + 1) & 0xff) << 8) | (pixels(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}

/** `binary → bigint`: the zlib-compressed size of the input (default
  * compression level), WITHOUT materializing the compressed bytes — the
  * kernel counts Deflater output into a scratch buffer. The classic
  * compression-ratio quality signal: highly repetitive machine-generated
  * text compresses far below natural prose, and near-random bytes don't
  * compress at all, so the ratio is a one-pass, language-agnostic
  * repetition/entropy filter (used by public web-corpus pipelines as a
  * cheap pre-filter before n-gram analysis). Deterministic for a given
  * JDK zlib; no oracle (DuckDB has no deflate) — property-tested. */
case class DeflatedSize(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflated_size"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    defl.setInput(bytes); defl.finish()
    val scratch = new Array[Byte](8192)
    var total = 0L
    while (!defl.finished()) total += defl.deflate(scratch)
    defl.end()
    total
  }

  override protected def withNewChildInternal(newChild: Expression): DeflatedSize =
    copy(child = newChild)
}

/** `binary (w*h*3 RGB bytes) → binary (complete zlib-compressed PNG)`. */
case class PngEncodeRgb8(child: Expression, imgWidth: Int, imgHeight: Int)
  extends UnaryExpression with CodegenFallback {
  require(imgWidth > 0 && imgHeight > 0 && imgWidth <= MediaCodec.MaxDim &&
    imgHeight <= MediaCodec.MaxDim, "png_encode_rgb8 dims out of range")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_encode_rgb8"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < imgWidth * imgHeight * 3) null
    else MediaCodec.encodePngRgb8(bytes, imgWidth, imgHeight)
  }

  override protected def withNewChildInternal(newChild: Expression): PngEncodeRgb8 =
    copy(child = newChild)
}

/** `binary (w*h*3 RGB bytes) → binary (baseline JPEG)`. */
case class JpegEncodeRgb8(child: Expression, imgWidth: Int, imgHeight: Int)
  extends UnaryExpression with CodegenFallback {
  require(imgWidth > 0 && imgHeight > 0 && imgWidth <= MediaCodec.MaxDim &&
    imgHeight <= MediaCodec.MaxDim, "jpeg_encode_rgb8 dims out of range")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_encode_rgb8"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < imgWidth * imgHeight * 3) null
    else MediaCodec.encodeJpegRgb8(bytes, imgWidth, imgHeight)
  }

  override protected def withNewChildInternal(newChild: Expression): JpegEncodeRgb8 =
    copy(child = newChild)
}

/** Full-fidelity PNG pixel stats (any compression level, all five filters,
  * gray/RGB/RGBA) — the Inflater-backed completion of
  * `Multimodal.pngPixelStats`' stored-block fast path. */
case class PngDecodeStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = MediaCodec.StatsSchema
  override def prettyName: String = "png_decode_stats"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaCodec.decodePngStats(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): PngDecodeStats =
    copy(child = newChild)
}

/** Raster pixel stats through the JDK's imageio plugins (JPEG's only decode
  * path; independent cross-check for PNG). */
case class ImageDecodeStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = MediaCodec.StatsSchema
  override def prettyName: String = "image_decode_stats"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaCodec.decodeImageStats(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): ImageDecodeStats =
    copy(child = newChild)
}
