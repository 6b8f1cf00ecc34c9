package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.expressions.MediaCodec
import graft.functions.MediaFunctions
import graft.queries.LlmOps

/** The JDK-backed entropy codec kernels (MediaCodec.scala): PNG
  * encode/decode round-trips at real compression levels, independence
  * cross-checks against the JDK's own imageio decoder, hostile-input
  * robustness, and the registered q_multimodal_inflate query. */
class MediaCodecSpec extends SparkSpec {

  /** Deterministic pseudo-random pixel buffer (no Math.random in tests —
    * seeded streams keep every failure reproducible). */
  private def pixels(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  private def sums(px: Array[Byte], w: Int, h: Int): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < w * h * 3) {
      (i % 3) match {
        case 0 => sr += px(i) & 0xff
        case 1 => sg += px(i) & 0xff
        case 2 => sb += px(i) & 0xff
      }
      i += 1
    }
    (sr, sg, sb)
  }

  private def statsOf(row: org.apache.spark.sql.catalyst.InternalRow) =
    (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4), row.getLong(5))

  test("PNG round-trip is exact across sizes and every filter type") {
    // Heights ≥ 4 exercise all of Sub/Up/Average/Paeth (rotating filter);
    // 1×1 and 5×3 cover the no-left/no-up boundary columns and rows.
    for (((w, h), seed) <- Seq((1, 1), (4, 4), (5, 3), (3, 7), (16, 16), (33, 9)).zipWithIndex) {
      val px = pixels(w * h * 3, 1000 + seed)
      val png = MediaCodec.encodePngRgb8(px, w, h)
      val dec = MediaCodec.decodePngStats(png)
      assert(dec != null, s"decode failed for ${w}x$h")
      val (sr, sg, sb) = sums(px, w, h)
      assert(statsOf(dec) === ((w.toLong, h.toLong, w.toLong * h, sr, sg, sb)))
      // Independent decoder must agree byte-for-byte on the same container.
      assert(statsOf(MediaCodec.decodeImageStats(png)) === statsOf(dec))
    }
  }

  test("decodes PNGs written by the independent JDK encoder (RGB, RGBA, gray)") {
    import java.awt.image.BufferedImage
    def write(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rgb = new BufferedImage(6, 5, BufferedImage.TYPE_INT_RGB)
    val argb = new BufferedImage(6, 5, BufferedImage.TYPE_INT_ARGB)
    val gray = new BufferedImage(6, 5, BufferedImage.TYPE_BYTE_GRAY)
    var sr = 0L; var sg = 0L; var sb = 0L; var sy = 0L
    for (y <- 0 until 5; x <- 0 until 6) {
      val (r, g, b) = ((x * 37 + y * 11) % 256, (x * 101 + y) % 256, (x + y * 53) % 256)
      sr += r; sg += g; sb += b
      rgb.setRGB(x, y, (r << 16) | (g << 8) | b)
      argb.setRGB(x, y, (0x80 << 24) | (r << 16) | (g << 8) | b)
      val v = (x * 29 + y * 7) % 256
      sy += v
      gray.getRaster.setSample(x, y, 0, v)
    }
    assert(statsOf(MediaCodec.decodePngStats(write(rgb))) ===
      ((6L, 5L, 30L, sr, sg, sb)))
    // RGBA: alpha ignored, color channels exact.
    assert(statsOf(MediaCodec.decodePngStats(write(argb))) ===
      ((6L, 5L, 30L, sr, sg, sb)))
    // Gray: the single channel lands in all three sums.
    assert(statsOf(MediaCodec.decodePngStats(write(gray))) ===
      ((6L, 5L, 30L, sy, sy, sy)))
  }

  test("concatenates IDAT data split across multiple chunks") {
    val px = pixels(4 * 4 * 3, 7)
    val whole = MediaCodec.encodePngRgb8(px, 4, 4)
    // Surgery: split the single IDAT into two chunks with fresh lengths and
    // CRCs. Layout: sig(8) + IHDR chunk(25) = 33, then IDAT.
    val idatLen = ((whole(33) & 0xff) << 24) | ((whole(34) & 0xff) << 16) |
      ((whole(35) & 0xff) << 8) | (whole(36) & 0xff)
    val data = java.util.Arrays.copyOfRange(whole, 41, 41 + idatLen)
    val cut = idatLen / 2
    def mkChunk(d: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + d.length)
      out.putInt(d.length).put("IDAT".getBytes("US-ASCII")).put(d)
      val crc = new java.util.zip.CRC32()
      crc.update(out.array(), 4, 4 + d.length)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val split = java.util.Arrays.copyOfRange(whole, 0, 33) ++
      mkChunk(java.util.Arrays.copyOfRange(data, 0, cut)) ++
      mkChunk(java.util.Arrays.copyOfRange(data, cut, idatLen)) ++
      java.util.Arrays.copyOfRange(whole, 41 + idatLen + 4, whole.length)
    val (sr, sg, sb) = sums(px, 4, 4)
    assert(statsOf(MediaCodec.decodePngStats(split)) ===
      ((4L, 4L, 16L, sr, sg, sb)))
  }

  test("hostile inputs decode to null, never throw") {
    val good = MediaCodec.encodePngRgb8(pixels(48, 3), 4, 4)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "junk" -> pixels(64, 4),
      "truncated" -> java.util.Arrays.copyOf(good, good.length - 9),
      "bad signature" -> patched(b => b(1) = 'Q'),
      // IHDR height lies small: inflated stream has surplus scanlines.
      "height understated" -> patched(b => b(23) = 2),
      // IHDR height lies big: stream truncates short of the declared volume.
      "height overstated" -> patched(b => b(23) = 9),
      // Dimensions beyond the bound must refuse before allocating.
      "bomb dims" -> patched { b => b(16) = 0x7f; b(20) = 0x7f },
      // A chunk length pointing past the buffer must not walk out of bounds.
      "chunk length escape" -> patched(b => b(33) = 0x7f.toByte),
      // Corrupt the zlib stream body.
      "garbled deflate" -> patched(b => b(45) = (b(45) ^ 0x55).toByte),
      "interlaced" -> patched(b => b(28) = 1),
      "palette color type" -> patched(b => b(25) = 3),
      "16-bit depth" -> patched(b => b(24) = 16),
      // zlib header 0x78 0x20 is checksum-valid (0x7820 % 31 == 0) with
      // FDICT set: inflate() returns 0 with needsDictionary() true and
      // needsInput() false — a decoder that only bails on needsInput()
      // spins a task thread forever on these 6 bytes. A regression here
      // manifests as this test hanging, not merely failing.
      "preset-dictionary header (FDICT spin)" -> {
        val payload = Array[Byte](0x78, 0x20, 0, 0, 0, 1)
        val out = java.nio.ByteBuffer.allocate(12 + payload.length)
        out.putInt(payload.length).put("IDAT".getBytes("US-ASCII")).put(payload)
        val crc = new java.util.zip.CRC32()
        crc.update(out.array(), 4, 4 + payload.length)
        out.putInt(crc.getValue.toInt)
        val idatLen = ((good(33) & 0xff) << 24) | ((good(34) & 0xff) << 16) |
          ((good(35) & 0xff) << 8) | (good(36) & 0xff)
        java.util.Arrays.copyOfRange(good, 0, 33) ++ out.array() ++
          java.util.Arrays.copyOfRange(good, 41 + idatLen + 4, good.length)
      })
    for ((name, bytes) <- cases)
      assert(MediaCodec.decodePngStats(bytes) == null, s"case: $name")
    for ((name, bytes) <- cases)
      // imageio may itself reject or decode a tampered container; the
      // contract under test is only that OUR wrapper never throws.
      MediaCodec.decodeImageStats(bytes)
  }

  test("JPEG round-trip: dimensions exact, channel means within codec error") {
    val px = new Array[Byte](8 * 8 * 3)
    java.util.Arrays.fill(px, 100.toByte)
    val jpg = MediaCodec.encodeJpegRgb8(px, 8, 8)
    // Magic bytes prove it really is entropy-coded JPEG, not a disguised copy.
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val dec = MediaCodec.decodeImageStats(jpg)
    assert(dec != null)
    assert((dec.getLong(0), dec.getLong(1), dec.getLong(2)) === ((8L, 8L, 64L)))
    // A solid-color plane survives DCT quantization almost exactly.
    for (c <- 3 to 5)
      assert(math.abs(dec.getLong(c) - 64L * 100) <= 64 * 2, s"channel $c")
  }

  test("q_multimodal_inflate: engine decoders agree and nulls propagate") {
    val df = LlmOps.qMultimodalInflate(spark, sf).cache()
    val rows = df.collect()
    assert(rows.length > 0)
    val withText = rows.filter(r => !r.isNullAt(1))
    assert(withText.length > 0)
    for (r <- withText) {
      assert(r.getLong(1) == 16L) // 4x4
      // Inflater kernel vs imageio plugin: identical sums per row.
      assert(r.getLong(2) == r.getLong(5) && r.getLong(3) == r.getLong(6) &&
        r.getLong(4) == r.getLong(7), s"decoder disagreement: $r")
      assert(r.getLong(8) == 16L) // JPEG lossless fact
    }
    df.unpersist()
  }

  test("perceptual aHash: stable under tiny edits, flips under inversion, null on junk") {
    def bmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val size = 54 + h * stride
      val b = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.putInt(0).putInt(h * stride).putInt(2835).putInt(2835)
      b.putInt(0).putInt(0)
      for (y <- 0 until h) {
        for (x <- 0 until w) {
          val (bb, gg, rr) = px(x, y)
          b.put(bb.toByte).put(gg.toByte).put(rr.toByte)
        }
        b.position(b.position() + stride - w * 3)
      }
      b.array()
    }
    import graft.expressions.BmpAHash
    val nul = org.apache.spark.sql.catalyst.expressions.Literal
      .create(null, org.apache.spark.sql.types.BinaryType)
    def hash(img: Array[Byte], gw: Int, gh: Int): Any =
      BmpAHash(nul, gw, gh).nullSafeEval(img)
    // left half dark, right half bright → 2×1 grid bits 01
    val split = bmp(8, 8, (x, _) => if (x < 4) (10, 10, 10) else (200, 200, 200))
    assert(hash(split, 2, 1) === 1L)
    // one-pixel tweak: perceptual hash must NOT move (the whole point)
    val tweaked = bmp(8, 8, (x, y) =>
      if (x == 0 && y == 0) (14, 12, 11)
      else if (x < 4) (10, 10, 10) else (200, 200, 200))
    assert(hash(tweaked, 2, 1) === hash(split, 2, 1))
    // inversion flips every bit: Hamming distance = grid size
    val inverted = bmp(8, 8, (x, _) => if (x < 4) (200, 200, 200) else (10, 10, 10))
    assert(hash(inverted, 2, 1) === 2L)
    assert(java.lang.Long.bitCount(
      hash(split, 2, 1).asInstanceOf[Long] ^
        hash(inverted, 2, 1).asInstanceOf[Long]) === 2)
    // finer grid stays engine-exact and in-range
    val h33 = hash(split, 3, 3).asInstanceOf[Long]
    assert(h33 >= 0L && h33 < 512L)
    // malformed inputs → null, never throw
    assert(hash(Array.emptyByteArray, 2, 1) == null)
    assert(hash(Array.fill[Byte](54)(0x42), 2, 1) == null)
    assert(hash(java.util.Arrays.copyOf(split, 60), 2, 1) == null) // truncated
    // pixel-data offset pointing INSIDE the header (off = 0) would alias
    // header bytes as pixels — must be rejected, not hashed
    val inHeaderOff = split.clone()
    inHeaderOff(10) = 0; inHeaderOff(11) = 0
    inHeaderOff(12) = 0; inHeaderOff(13) = 0
    assert(hash(inHeaderOff, 2, 1) == null)
    // grid finer than the image → null (8×8 grid over a 3×3 image)
    assert(hash(bmp(3, 3, (_, _) => (5, 5, 5)), 8, 8) == null)
    // an impossible 64-bit-plus grid is a caller bug → constructor rejects
    intercept[IllegalArgumentException] { BmpAHash(nul, 9, 9) }
  }

  test("compression ratio orders repetition < prose < noise") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 200),                                     // repetition
      (2L, ("the quick brown fox jumps over the lazy dog " +
        "while discussing spark shuffle partitioning at length ") * 10),
      (3L, pixels(1000, 99).map(b => "%02x".format(b)).mkString)) // noise-ish
      .toDF("doc_id", "text")
    def ratios() = docs
      .select(col("doc_id"), (MediaFunctions.deflatedSize(
        col("text").cast("binary")) * 1000 /
        length(col("text"))).cast("long").as("r"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    val r = ratios()
    assert(r(0) < r(1) && r(1) < r(2), r.mkString(","))
    assert(r(0) < 100, s"pure repetition should crush: ${r(0)}")
    assert(ratios().toSeq === r.toSeq) // deterministic
    // registered query: every doc scored, flags consistent with ratio
    val q = LlmOps.qCompressRatio(spark, sf).collect()
    assert(q.nonEmpty)
    for (row <- q) {
      assert(row.getLong(2) > 0 && row.getLong(1) > 0)
      assert(row.getBoolean(4) === (row.getLong(3) < 300))
    }
  }

  test("codec functions are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT deflated_size(CAST('aaaaaaaaaaaaaaaa' AS BINARY)) AS z, " +
        "png_decode_stats(CAST('not a png' AS BINARY)) AS p, " +
        "image_decode_stats(CAST('not an image' AS BINARY)) AS i, " +
        "size(avi_frames(CAST('not an avi' AS BINARY))) AS a").collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("column-level null propagation") {
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("t")
      .select(MediaFunctions.pngDecodeStats(
        MediaFunctions.pngEncodeRgb8(
          unhex(concat(sha2(col("t"), 256), md5(col("t")))), 4, 4)).as("s"))
    val out = df.select(col("s.n_px")).as[Option[Long]].collect()
    assert(out(0).contains(16L) && out(1).isEmpty)
  }

  test("bmp block resize: cells tile the image — per-doc cell sums equal bmpPixelStats") {
    import graft.operators.Multimodal
    // the resize grid is a PARTITION of the pixel plane: summing every
    // cell's (n_px, Σb, Σg, Σr) must reproduce the whole-image decoder
    val cellTotals = LlmOps.qImgResize(spark, sf)
      .groupBy("doc_id")
      .agg(sum("n_px").as("n_px"), sum("sum_b").as("b"),
        sum("sum_g").as("g"), sum("sum_r").as("r"))
    val whole = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), Multimodal.bmpPixelStats(
        Multimodal.syntheticBmp3x3(
          unhex(concat(sha2(col("text"), 256), md5(col("text")))))).as("s"))
      .select(col("doc_id"), col("s.n_px").as("w_n_px"),
        col("s.sum_b").as("wb"), col("s.sum_g").as("wg"),
        col("s.sum_r").as("wr"))
    val mismatches = cellTotals.join(whole, "doc_id")
      .filter(col("n_px") =!= col("w_n_px") || col("b") =!= col("wb") ||
        col("g") =!= col("wg") || col("r") =!= col("wr"))
      .count()
    assert(mismatches === 0L)
    // and a doc with NULL text yields NULL cell stats, not zeros
    import spark.implicits._
    val nullStats = Seq((1L, None: Option[String])).toDF("doc_id", "text")
      .select(Multimodal.bmpCellStats(
        Multimodal.syntheticBmp3x3(
          unhex(concat(sha2(col("text"), 256), md5(col("text"))))),
        2, 2, lit(0L), lit(0L)).as("st"))
      .select(col("st.n_px")).as[Option[Long]].head()
    assert(nullStats.isEmpty)
  }
}
