package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate accuracy properties (SURVEY.md §5.2 item 3):
  * approx_count_distinct within 5% of exact, and the hash partition
  * assignment is stable and total. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on events") {
    val df = Tables.events(spark, sf)
    val (approx, exact) = df.agg(
      approx_count_distinct(col("user_id")),
      countDistinct(col("user_id")))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_count_distinct within 5% across cardinalities") {
    for (n <- Seq(137, 523, 1201, 4999, 20011)) {
      val df = spark.range(0, n * 3L).select((col("id") % n).as("k"))
      // rsd 0.02 → the 5% gate sits at 2.5σ of the HLL estimator
      val (approx, exact) = df.agg(
        approx_count_distinct(col("k"), 0.02), countDistinct(col("k")))
        .as[(Long, Long)].head()
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"n=$n approx=$approx exact=$exact")
    }
  }

  test("approx_percentile within 2% of exact per return flag") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a, e) =>
      assert(math.abs(a - e) / e <= 0.02, s"flag=$flag approx=$a exact=$e")
    }
  }

  test("q_uuid: one RFC-4122 v4 id per row, all distinct") {
    val df = graft.queries.ScalarFuncs.qUuid(spark, sf)
    val n = df.count()
    assert(n > 0)
    assert(df.select("id").distinct().count() === n)
    val v4 = "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"
    assert(df.filter(not(col("id").rlike(s"^$v4$$"))).count() === 0)
  }

  test("pmod(hash(k), n) partition assignment is stable and total") {
    val df = spark.range(0, 10000)
      .select(pmod(hash(col("id")), lit(32)).as("p"))
    val counts = df.groupBy("p").count().as[(Int, Long)].collect().toMap
    // total: every row lands in [0, 32)
    assert(counts.keys.forall(p => p >= 0 && p < 32))
    assert(counts.values.sum === 10000L)
    // all 32 partitions used, no partition grossly over-loaded (< 3x mean)
    assert(counts.size === 32)
    assert(counts.values.max < 3 * (10000 / 32))
    // stability: same input → same assignment
    val again = spark.range(0, 10000)
      .select(pmod(hash(col("id")), lit(32)).as("p"))
      .groupBy("p").count().as[(Int, Long)].collect().toMap
    assert(again === counts)
  }
}
