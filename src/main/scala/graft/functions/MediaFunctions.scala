package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import graft.expressions.{AviEncodeFrames, AviFrames, DeflatedSize, ImageDecodeStats, JpegEncodeRgb8, PngDecodeStats, PngEncodeRgb8}

/** Column wrappers for the JDK-backed media codec expressions (SURVEY.md §2
  * B-10 multimodal surface — the entropy-coded completion of
  * `operators.Multimodal`'s columnar header/stored-block decoders). */
object MediaFunctions {

  /** `w*h*3` RGB bytes → complete zlib-compressed PNG (real DEFLATE, real
    * CRC32/Adler-32, rotating Sub/Up/Average/Paeth scanline filters). */
  def pngEncodeRgb8(pixels: Column, width: Int, height: Int): Column =
    Bridge.column(PngEncodeRgb8(Bridge.expression(pixels), width, height))

  /** Any-compression non-interlaced 8-bit PNG →
    * `(width, height, n_px, sum_r, sum_g, sum_b)`, null on anything else. */
  def pngDecodeStats(png: Column): Column =
    Bridge.column(PngDecodeStats(Bridge.expression(png)))

  /** Raster stats via the JDK imageio plugins — the JPEG decode path and an
    * independent PNG cross-check. */
  def imageDecodeStats(bytes: Column): Column =
    Bridge.column(ImageDecodeStats(Bridge.expression(bytes)))

  /** `w*h*3` RGB bytes → baseline JPEG (JDK encoder, default quality). */
  def jpegEncodeRgb8(pixels: Column, width: Int, height: Int): Column =
    Bridge.column(JpegEncodeRgb8(Bridge.expression(pixels), width, height))

  /** AVI container → `array<struct<frame_idx, byte_offset, frame_bytes>>`
    * of its `movi` video chunks; null for malformed input. */
  def aviFrames(avi: Column): Column =
    Bridge.column(AviFrames(Bridge.expression(avi)))

  /** Frame source bytes → complete AVI (`nFrames` × `frameLen`, plus
    * hdrl/JUNK framing a real parser must skip). */
  def aviEncodeFrames(src: Column, frameLen: Int, nFrames: Int): Column =
    Bridge.column(AviEncodeFrames(Bridge.expression(src), frameLen, nFrames))

  /** zlib-compressed size of a binary column (no bytes materialized) —
    * the compression-ratio repetition/entropy signal. */
  def deflatedSize(bytes: Column): Column =
    Bridge.column(DeflatedSize(Bridge.expression(bytes)))
}
