package graft.expressions

import java.io.ByteArrayOutputStream
import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Offline stand-in for the Confluent Schema Registry: deterministic ids
  * keyed by canonical schema JSON, register-on-first-use semantics (the
  * reference registers the subject on first encode and caches the id,
  * /root/reference/Godeps/_workspace/src/github.com/elodina/go-kafka-avro/avro_encoder_decoder.go:50-61).
  */
object SchemaRegistryStub {
  private val ids = TrieMap.empty[String, Int]

  /** Value-side subject naming, byte-for-byte the reference encoder's
    * `schema.GetName() + "-value"`
    * (/root/reference/Godeps/_workspace/src/github.com/elodina/go-kafka-avro/avro_encoder_decoder.go:56):
    * the subject derives from the Avro RECORD NAME, not the topic or the
    * namespace-qualified full name. */
  def subjectFor(schemaJson: String): String =
    new Schema.Parser().parse(schemaJson).getName + "-value"

  /** Deterministic positive id derived from the canonical schema string —
    * stable across sessions and executors (no registry round-trip). */
  def register(subject: String, schemaJson: String): Int =
    ids.getOrElseUpdate(subject + "|" + schemaJson, {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((subject + "|" + schemaJson).getBytes("UTF-8"))
      ((d(0) & 0x7f) << 24) | ((d(1) & 0xff) << 16) |
        ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    })
}

/** Confluent wire framing + Avro body: magic byte 0x00, big-endian int32
  * schema id, then the Avro-binary record — byte-per-byte the reference's
  * encoder
  * (/root/reference/Godeps/_workspace/src/github.com/elodina/go-kafka-avro/avro_encoder_decoder.go:62-79).
  *
  * A Catalyst `UnaryExpression` over a struct child whose fields must match
  * the Avro schema positionally (string/int/long/bytes supported — the
  * SlaveMetrics envelope uses exactly these,
  * /root/reference/avro/slave_metrics.avsc:1-30). `CodegenFallback`: the
  * Avro writer is an opaque library call with no profitable codegen body;
  * the expression still runs inside the task pipeline with zero shuffle.
  */
case class ConfluentAvroEncode(child: Expression, schemaJson: String,
    schemaId: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "confluent_avro_encode"

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val rec = new GenericData.Record(schema)
    val fields = schema.getFields
    var i = 0
    while (i < fields.size()) {
      val f = fields.get(i)
      val v = f.schema().getType match {
        case Schema.Type.STRING =>
          row.getUTF8String(i).toString
        case Schema.Type.INT => row.getInt(i)
        case Schema.Type.LONG => row.getLong(i)
        case Schema.Type.BYTES =>
          java.nio.ByteBuffer.wrap(row.getBinary(i))
        case Schema.Type.DOUBLE => row.getDouble(i)
        case Schema.Type.FLOAT => row.getFloat(i)
        case Schema.Type.BOOLEAN => row.getBoolean(i)
        case other =>
          throw new IllegalArgumentException(s"unsupported avro type $other")
      }
      rec.put(i, v)
      i += 1
    }
    val body = new ByteArrayOutputStream()
    // magic 0x00 + big-endian schema id, then the Avro binary body
    body.write(0)
    body.write((schemaId >>> 24) & 0xff)
    body.write((schemaId >>> 16) & 0xff)
    body.write((schemaId >>> 8) & 0xff)
    body.write(schemaId & 0xff)
    val enc = EncoderFactory.get().directBinaryEncoder(body, null)
    writer.write(rec, enc)
    enc.flush()
    body.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroEncode =
    copy(child = newChild)
}

/** Inverse of [[ConfluentAvroEncode]]: strip the Confluent frame (assert
  * magic 0x00, read the BE int32 schema id) and decode the Avro body back
  * into a struct — the consumer side of the reference's wire format
  * (/root/reference/Godeps/_workspace/src/github.com/elodina/go-kafka-avro/avro_encoder_decoder.go:81-105).
  * Frames whose schema id differs from `schemaId` (or with a bad magic
  * byte) decode to null, mirroring the decoder's error posture. */
case class ConfluentAvroDecode(child: Expression, schemaJson: String,
    schemaId: Int)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)

  override def dataType: DataType = StructType(
    scala.jdk.CollectionConverters.ListHasAsScala(schema.getFields)
      .asScala.toSeq.map { f =>
      val t = f.schema().getType match {
        case Schema.Type.STRING => StringType
        case Schema.Type.INT => IntegerType
        case Schema.Type.LONG => LongType
        case Schema.Type.BYTES => BinaryType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case other =>
          throw new IllegalArgumentException(s"unsupported avro type $other")
      }
      StructField(f.name(), t, nullable = false)
    })
  override def nullable: Boolean = true
  override def prettyName: String = "confluent_avro_decode"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 5 || bytes(0) != 0) return null
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    if (id != schemaId) return null
    val dec = DecoderFactory.get()
      .binaryDecoder(bytes, 5, bytes.length - 5, null)
    val rec = reader.read(null, dec)
    val fields = schema.getFields
    val out = new Array[Any](fields.size())
    var i = 0
    while (i < fields.size()) {
      out(i) = rec.get(i) match {
        case s: org.apache.avro.util.Utf8 => UTF8String.fromString(s.toString)
        case s: String => UTF8String.fromString(s)
        case b: java.nio.ByteBuffer =>
          val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
        case v => v
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroDecode =
    copy(child = newChild)
}
