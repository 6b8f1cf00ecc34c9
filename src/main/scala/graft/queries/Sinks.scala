package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.EnvelopeSink

/** B-1 sink queries — the reference's actual output path (SURVEY.md §2):
  * envelope build + serialization + keyed kafka-shaped rows.
  */
object Sinks extends QueryFamily {

  /** q_sink_envelope — JSON transform: the oracle byte-compares the full
    * serialized envelope string (Go-struct field order, compact JSON,
    * /root/reference/syscol/metrics_reporter.go:143-148). */
  def qSinkEnvelope(s: SparkSession, dir: String): DataFrame =
    EnvelopeSink.envelope(Tables.events(s, dir))
      .withColumn("kafka_value", EnvelopeSink.toJsonValue)
      .select(
        col("event_id"),
        col("SlaveID").as("kafka_key"),
        col("kafka_value"))
      .orderBy("event_id")

  /** q_sink_envelope_avro — Confluent-framed Avro transform over the same
    * envelope: magic 0x00 + BE schema id + Avro body with the payload as
    * opaque JSON bytes. Bytes are asserted against an independent
    * spec-level encoder in ConfluentAvroSpec; rows-only here (DuckDB has no
    * Avro). */
  def qSinkEnvelopeAvro(s: SparkSession, dir: String): DataFrame =
    EnvelopeSink.kafkaRows(Tables.events(s, dir), "avro")
      .select(col("event_id"), col("key"), col("value"),
        length(col("value")).cast("long").as("n_bytes"))
      .orderBy("event_id")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sink_envelope" -> (qSinkEnvelope _),
    "q_sink_envelope_avro" -> (qSinkEnvelopeAvro _))

  override val oracle: Map[String, String] = Map(
    "q_sink_envelope" ->
      """SELECT event_id,
        |  'slave-' || CAST(user_id AS VARCHAR) AS kafka_key,
        |  '{"SlaveID":"slave-' || CAST(user_id AS VARCHAR) ||
        |    '","Hostname":"host-' || CAST(user_id % 5 AS VARCHAR) ||
        |    '","Port":5051,"Namespace":"prod","Timestamp":' ||
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS VARCHAR) ||
        |    ',"Metrics":' || CAST(json_extract(props, '$') AS VARCHAR) || '}'
        |    AS kafka_value
        |FROM events ORDER BY event_id""".stripMargin)
}
