package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.ConfluentAvroEncode
import graft.operators.EnvelopeSink

/** Session extensions installer: registers graft's custom SQL functions so
  * SQL users can call them directly. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * `confluent_avro_encode(struct)` — Confluent wire framing + Avro body for
  * the SlaveMetrics envelope (SURVEY.md §2 A7). The DataFrame API path
  * (EnvelopeSink.toAvroValue) does not require the extension.
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
  }
}
