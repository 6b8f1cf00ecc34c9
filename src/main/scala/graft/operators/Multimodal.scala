package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 B-10): treat image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, and run
  * feature extraction as a columnar batch transform.
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — with a deterministic digest-derived feature vector, so the
  * Spark-side contract (schema, partitioning, batch shape, null posture) is
  * real and testable while the decoder body is swappable. In production the
  * decode step would be an `mapInArrow`/Pandas-UDF batch calling the codec;
  * everything downstream of the `features` column is unchanged.
  *
  * Scale posture: payloads stay opaque bytes end-to-end (no row-level JVM
  * object churn); metadata extraction is codegen'd; feature extraction is
  * one narrow projection — embarrassingly parallel, no shuffle.
  */
object Multimodal {

  /** Read `len` bytes at 1-based `pos` of a binary column as an unsigned
    * little-endian integer: per-byte substring → byte-reversed concat → one
    * hex/conv. Pure codegen'd built-ins — container headers parse without
    * any media library. */
  private def leUInt(bin: Column, pos: Int, len: Int): Column =
    conv(hex(concat((0 until len).reverse.map(i =>
      substring(bin, pos + i, 1)): _*)), 16, 10).cast("long")

  private def magic(bin: Column, pos: Int, len: Int): Column =
    hex(substring(bin, pos, len))

  /** Big-endian sibling of [[leUInt]] — PNG's network byte order. */
  private def beUInt(bin: Column, pos: Int, len: Int): Column =
    conv(hex(substring(bin, pos, len)), 16, 10).cast("long")

  /** Magic-byte MIME sniffing over the payload prefix (BMP/WAV/AVI/PNG/
    * JPEG), with a caller-chosen fallback for unrecognized bytes. Hex-string
    * comparison sidesteps binary-literal encoding pitfalls (0x89 is not
    * valid UTF-8, so a string-literal cast could never express PNG magic). */
  def detectMime(payload: Column, fallback: String): Column =
    when(magic(payload, 1, 2) === "424D", "image/bmp")
      .when(magic(payload, 1, 4) === "52494646" &&
        magic(payload, 9, 4) === "57415645", "audio/wav")
      .when(magic(payload, 1, 4) === "52494646" &&
        magic(payload, 9, 4) === "41564920", "video/avi")
      .when(magic(payload, 1, 4) === "89504E47", "image/png")
      .when(magic(payload, 1, 2) === "FFD8", "image/jpeg")
      .otherwise(fallback)

  /** REAL (not stubbed) BMP header parse: (width, height, bpp) from the
    * BITMAPINFOHEADER fields — null for non-BMP payloads. Little-endian
    * byte arithmetic on the binary column; no decode library involved. */
  def parseBmp(payload: Column): Column =
    when(magic(payload, 1, 2) === "424D" && length(payload) >= 30,
      struct(
        leUInt(payload, 19, 4).as("width"),
        leUInt(payload, 23, 4).as("height"),
        leUInt(payload, 29, 2).as("bpp")))

  /** REAL (not stubbed) PNG IHDR parse: (width, height, bit_depth,
    * color_type) from the mandatory first chunk — PNG is big-endian
    * (network order), and IHDR must open the chunk stream at offset 9
    * (8-byte signature + 4-byte length), so the fields sit at fixed
    * offsets. Null for non-PNG payloads. */
  def parsePng(payload: Column): Column =
    when(magic(payload, 1, 4) === "89504E47" &&
      magic(payload, 13, 4) === "49484452" && length(payload) >= 26,
      struct(
        beUInt(payload, 17, 4).as("width"),
        beUInt(payload, 21, 4).as("height"),
        beUInt(payload, 25, 1).as("bit_depth"),
        beUInt(payload, 26, 1).as("color_type")))

  /** REAL (not stubbed) WAV/RIFF header parse: (n_channels, sample_rate,
    * bits_per_sample) from the canonical fmt chunk — null for non-WAV. */
  def parseWav(payload: Column): Column =
    when(magic(payload, 1, 4) === "52494646" &&
      magic(payload, 9, 4) === "57415645" && length(payload) >= 36,
      struct(
        leUInt(payload, 23, 2).as("n_channels"),
        leUInt(payload, 25, 4).as("sample_rate"),
        leUInt(payload, 35, 2).as("bits_per_sample")))

  /** Attach a binary payload column + typed metadata struct. The payload
    * here is the UTF-8 encoding of the text column (the test corpus has no
    * real media); with real data this is the raw media column as read. The
    * mime field is SNIFFED from the payload's magic bytes (text/plain
    * fallback for this corpus) — real container bytes identify themselves,
    * asserted on crafted BMP/WAV/PNG headers in CorpusOpsSpec. */
  def withPayload(df: DataFrame, textCol: String): DataFrame = {
    val bin = col(textCol).cast("binary")
    df.withColumn("payload", bin)
      .withColumn("media_meta", struct(
        length(bin).cast("long").as("n_bytes"),
        sha2(bin, 256).as("digest"),
        detectMime(bin, fallback = "text/plain").as("mime"),
        substring(col(textCol), 1, 8).as("head")))
  }

  /** STUB decoder: deterministic 8-dim feature vector derived from the
    * payload digest (two hex chars per dim, scaled to [0,1]). Real decode
    * (image resize / audio frames) would replace only this expression.
    * Built as a static `array(...)` projection, NOT a transform lambda: an
    * interpreted lambda re-evaluates the outer digest per element, while
    * codegen subexpression elimination computes the sha2 once here. */
  def decodeFeaturesStub(payload: Column): Column = {
    val digest = sha2(payload, 256)
    array((0 until 8).map(i =>
      (conv(substring(digest, i * 2 + 1, 2), 16, 10)
        .cast("double") / 255.0).cast("float")): _*)
  }

  /** Full stub pipeline: payload → metadata → features. */
  def extract(df: DataFrame, textCol: String): DataFrame =
    withPayload(df, textCol)
      .withColumn("features", decodeFeaturesStub(col("payload")))

  /** STUB frame sampler: every `stride`-th fixed-size window of the payload
    * becomes one "frame" row (frame_idx, byte offset, frame bytes) — the
    * video → frames explode. The schema and explode shape are the real
    * contract; a production decoder replaces the byte-window slicing with
    * codec output. One narrow explode, no shuffle; at 100 TB the frames
    * inherit the payload's partitioning. */
  def sampleFrames(df: DataFrame, frameBytes: Int = 16,
      stride: Int = 4): DataFrame = {
    val nFrames =
      floor((length(col("payload")) - frameBytes) / (frameBytes * stride))
        .cast("int") + 1
    // payloads shorter than one frame yield ZERO frames: an unguarded
    // sequence(0, nFrames-1) with nFrames <= 0 descends (step -1) and emits
    // spurious negative-offset frames
    val idxs = when(nFrames > 0, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame", explode(transform(
        idxs,
        i => {
          val off = i * (frameBytes * stride) + 1
          struct(
            i.as("frame_idx"),
            (off - 1).cast("long").as("byte_offset"),
            // substring works positionally on binary payloads
            col("payload").substr(off, lit(frameBytes)).as("bytes"))
        })))
      .select(df.columns.toIndexedSeq.map(col) :+ col("frame.frame_idx")
        :+ col("frame.byte_offset") :+ col("frame.bytes").as("frame_bytes"): _*)
  }

  /** STUB resize: recompute the feature vector at a different "resolution"
    * (dim count) from the same digest — stands in for image resize +
    * re-embed. Deterministic; schema `array<float>` of `dims`. Static
    * projection for the same CSE reason as decodeFeaturesStub. */
  def resizeFeaturesStub(payload: Column, dims: Int): Column = {
    val digest = sha2(payload, 512)
    array((0 until dims).map(i =>
      (conv(substring(digest, i * 2 + 1, 2), 16, 10)
        .cast("double") / 255.0).cast("float")): _*)
  }
}
