package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Schema-drift guard for the driver-generated testdata.
  *
  * The driver has regenerated /root/testdata more than once with different
  * parquet timestamp encodings for `events.ts` (TIMESTAMP(NANOS) → raw-long
  * via legacy conf; TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ
  * under Spark 4's default inference). `Tables.events` must normalize every
  * generation to TimestampType so `unix_micros(ts)` call sites keep working.
  * This spec makes the next regeneration break ONE unit test instead of five
  * queries at correctness time.
  */
class TablesSpec extends SparkSpec {
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d + "/events.parquet").exists)

  test("events.ts normalizes to TimestampType in every sf dir") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    sfDirs.foreach { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$d: expected TimestampType, got ${ev.schema("ts").dataType}")
    }
  }

  test("events.ts epoch micros are sane and unix_micros analyzes") {
    val ev  = Tables.events(spark, sf)
    val row = ev.agg(min(unix_micros(col("ts"))).as("lo"),
                     max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // Plausible epoch-micros range: 2000-01-01 .. 2100-01-01.
    assert(lo >= 946684800000000L && hi <= 4102444800000000L,
      s"epoch micros out of range: [$lo, $hi]")
    assert(lo <= hi)
  }

  test("all tables load with expected key columns") {
    val checks: Seq[(String, org.apache.spark.sql.DataFrame, String)] = Seq(
      ("region", Tables.region(spark, sf), "r_regionkey"),
      ("nation", Tables.nation(spark, sf), "n_nationkey"),
      ("customer", Tables.customer(spark, sf), "c_custkey"),
      ("supplier", Tables.supplier(spark, sf), "s_suppkey"),
      ("part", Tables.part(spark, sf), "p_partkey"),
      ("orders", Tables.orders(spark, sf), "o_orderkey"),
      ("lineitem", Tables.lineitem(spark, sf), "l_orderkey"),
      ("events", Tables.events(spark, sf), "event_id"),
      ("documents", Tables.documents(spark, sf), "doc_id"),
      ("embeddings", Tables.embeddings(spark, sf), "vec_id")
    )
    checks.foreach { case (name, df, key) =>
      assert(df.columns.contains(key), s"$name missing key column $key (has: ${df.columns.mkString(",")})")
      assert(df.limit(1).count() == 1, s"$name is empty")
    }
  }
}
