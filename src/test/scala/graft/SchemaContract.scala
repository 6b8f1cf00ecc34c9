package graft

import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StructType}

/** The driver-comparator contract, enforced structurally.
  *
  * The verify driver loads each oracle-checked query's parquet dump into
  * pandas and sorts every column's values before hashing. Array, binary,
  * and map cells are unsortable/unhashable there (numpy.ndarray and
  * bytearray both raise), so any such column in a CHECKED output silently
  * turns the round's correctness row red — this exact class cost round 7
  * (q_sink_envelope_avro, raw BINARY) and round 8 (q_emb_rp, array<long>).
  * Both ContractSpec (registered queries) and the streaming at-rest sink
  * assertions share this helper so a third recurrence is impossible.
  */
object SchemaContract {

  /** Columns (dot-paths) whose type the driver comparator cannot sort. */
  def unsortableColumns(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      offending(f.dataType, path)
    }

  private def offending(dt: DataType, path: String): Seq[String] = dt match {
    case _: ArrayType | _: MapType | BinaryType => Seq(s"$path: ${dt.simpleString}")
    case st: StructType                         => unsortableColumns(st, path)
    case _                                      => Nil
  }
}
