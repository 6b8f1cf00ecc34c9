package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{AviFrames, ConfluentAvroEncode, CosineSimilarity, DeflatedSize, DotProduct, Fnv1a32, ImageDecodeStats, NfcNormalize, PngDecodeStats, SimHash64}
import graft.operators.EnvelopeSink

/** Session extensions installer: registers graft's custom SQL functions so
  * SQL users can call them directly. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * `confluent_avro_encode(struct)` — Confluent wire framing + Avro body for
  * the SlaveMetrics envelope (SURVEY.md §2 A7).
  * `fnv1a32(binary)` — the reference producer's placement hash (A11).
  * `cosine_sim(arr, arr)` / `dot_product(arr, arr)` — the codegen vector
  * kernels behind the similarity operators (B-10).
  * `simhash64(array<string>)` — the 64-bit SimHash signature (B-10).
  * `nfc_normalize(string)` — unicode NFC canonicalization (no Spark
  * built-in exists; digest-keyed operators need it).
  * `png_decode_stats(binary)` / `image_decode_stats(binary)` — pixel
  * stats via the Inflater kernel / the JDK imageio plugins (B-10
  * multimodal decode).
  * `avi_frames(binary)` — RIFF/AVI video-frame extraction.
  * `deflated_size(binary)` — zlib-compressed size (the compression-ratio
  * quality signal).
  * The DataFrame API paths (EnvelopeSink.toAvroValue,
  * HashFunctions.fnv1a32, VectorFunctions, TextFunctions.simhash64) do not
  * require the extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("confluent_avro_encode"),
      new ExpressionInfo(classOf[ConfluentAvroEncode].getName,
        "confluent_avro_encode"),
      (children: Seq[Expression]) => children match {
        case Seq(child) =>
          ConfluentAvroEncode(child, EnvelopeSink.schemaJson,
            EnvelopeSink.schemaId)
        case _ => throw new IllegalArgumentException(
          "confluent_avro_encode expects exactly one struct argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("fnv1a32"),
      new ExpressionInfo(classOf[Fnv1a32].getName, "fnv1a32"),
      (children: Seq[Expression]) => children match {
        case Seq(child) => Fnv1a32(child)
        case _ => throw new IllegalArgumentException(
          "fnv1a32 expects exactly one binary argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case _ => throw new IllegalArgumentException(
          "cosine_sim expects exactly two array arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "dot_product expects exactly two array arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => children match {
        case Seq(child) => NfcNormalize(child)
        case _ => throw new IllegalArgumentException(
          "nfc_normalize expects exactly one string argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => children match {
        case Seq(child) => SimHash64(child)
        case _ => throw new IllegalArgumentException(
          "simhash64 expects exactly one array<string> argument")
      }))
    def unary(name: String, clazz: Class[_], make: Expression => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => children match {
          case Seq(child) => make(child)
          case _ => throw new IllegalArgumentException(
            s"$name expects exactly one binary argument")
        }))
    unary("png_decode_stats", classOf[PngDecodeStats], PngDecodeStats(_))
    unary("image_decode_stats", classOf[ImageDecodeStats], ImageDecodeStats(_))
    unary("avi_frames", classOf[AviFrames], AviFrames(_))
    unary("deflated_size", classOf[DeflatedSize], DeflatedSize(_))
  }
}
