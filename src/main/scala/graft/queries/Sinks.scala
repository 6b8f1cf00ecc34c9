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
    * opaque JSON bytes. FULL-oracle: Avro binary is a deterministic byte
    * layout (zigzag varints + length-prefixed utf8), so the oracle
    * rebuilds the frame byte-for-byte in SQL — varints via an inline
    * HUGEINT 7-bit-group generator (the ns timestamp's zigzag doubles past
    * int64), the schema id as the generated literal the registry fixture
    * independently pins. The spec-level encoder cross-check in
    * ConfluentAvroSpec stays on top.
    *
    * Projection note: the frame is exposed as HEX STRINGS (`key_hex`,
    * `value_hex`), not raw BINARY — the hex string IS the byte content
    * (both engines emit canonical uppercase hex), while raw binary
    * columns are unsortable by the driver's pandas comparator. The
    * raw-bytes sink contract stays covered by EnvelopeSpec fixtures. */
  def qSinkEnvelopeAvro(s: SparkSession, dir: String): DataFrame =
    EnvelopeSink.kafkaRows(Tables.events(s, dir), "avro")
      .select(col("event_id"),
        hex(col("key")).as("key_hex"),
        hex(col("value")).as("value_hex"),
        length(col("value")).cast("long").as("n_bytes"))
      .orderBy("event_id")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sink_envelope" -> (qSinkEnvelope _),
    "q_sink_envelope_avro" -> (qSinkEnvelopeAvro _))

  /** Inline DuckDB varint-hex generator: the 7-bit little-endian groups of
    * `zz` (an unsigned zigzag value as HUGEINT expression) with
    * continuation bits, as a hex string. */
  private def vi(zz: String): String =
    s"""(SELECT string_agg(lpad(to_hex(CAST(((($zz) >> (7*i)) & 127) +
       |      CASE WHEN (($zz) >> (7*(i+1))) > 0 THEN 128 ELSE 0 END AS INTEGER)), 2, '0'),
       |    '' ORDER BY i)
       |  FROM range(0, 10) t(i) WHERE i = 0 OR (($zz) >> (7*i)) > 0)""".stripMargin

  private def avroOracle: String = {
    val idHex = f"${EnvelopeSink.schemaId}%08x"
    s"""WITH enc AS (
       |  SELECT event_id,
       |    'slave-' || CAST(user_id AS VARCHAR) AS sid,
       |    'host-' || CAST(user_id % 5 AS VARCHAR) AS host,
       |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS BIGINT) AS ts_ns,
       |    CAST(json_extract(props, '$$') AS VARCHAR) AS mjson
       |  FROM events),
       |hexed AS (
       |  SELECT event_id, sid,
       |    '00' || '$idHex'
       |    || ${vi("CAST(2*octet_length(CAST(sid AS BLOB)) AS HUGEINT)")} || hex(sid)
       |    || ${vi("CAST(2*octet_length(CAST(host AS BLOB)) AS HUGEINT)")} || hex(host)
       |    || ${vi("CAST(10102 AS HUGEINT)")}
       |    || ${vi("CAST(8 AS HUGEINT)")} || hex('prod')
       |    || ${vi("CAST(ts_ns AS HUGEINT) * 2")}
       |    || ${vi("CAST(2*octet_length(CAST(mjson AS BLOB)) AS HUGEINT)")} || hex(mjson)
       |    AS vhex
       |  FROM enc)
       |SELECT event_id, hex(CAST(sid AS BLOB)) AS key_hex,
       |  hex(unhex(vhex)) AS value_hex,
       |  CAST(octet_length(unhex(vhex)) AS BIGINT) AS n_bytes
       |FROM hexed ORDER BY event_id""".stripMargin
  }

  override val oracle: Map[String, String] = Map(
    "q_sink_envelope_avro" -> avroOracle,
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
