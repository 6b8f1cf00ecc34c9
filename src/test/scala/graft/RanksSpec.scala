package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** The two-phase rank contract: [[Ranks.rowNumber]] and
  * [[Ranks.orderStatAt]] must return EXACTLY what the naive
  * whole-group window returns, for any monotone bucketing — including
  * skewed buckets, empty part groups, several positions straddling one
  * bucket, and the no-part (global order) case. The scale claim (no
  * data-proportional window partition) is pinned in PlanSpec; this spec
  * pins the equivalence the rewrite rests on. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: value collisions (v % 17), three
  // skewed groups, ids unique
  private lazy val df = spark.range(0, 500)
    .select(col("id"),
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 2654435761L) % 97 % 17).as("v"))
    .localCheckpoint(eager = true)

  // exceptAll compares positionally: fix column order + rn width first
  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.select(col("id"), col("g"), col("v"), col("rn").cast("long").as("rn"))

  test("rowNumber equals the naive whole-group window for every row") {
    val naive = canon(df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v", "id"))))
    val two = canon(Ranks.rowNumber(df, Seq("g"), expr("v div 5"),
      Seq(col("v"), col("id")), "rn"))
    assert(two.count() === 500)
    assert(naive.exceptAll(two).isEmpty && two.exceptAll(naive).isEmpty)
  }

  test("rowNumber with a degenerate one-bucket coarsening still matches") {
    val naive = canon(df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v", "id"))))
    val two = canon(Ranks.rowNumber(df, Seq("g"), lit(0L),
      Seq(col("v"), col("id")), "rn"))
    assert(naive.exceptAll(two).isEmpty && two.exceptAll(naive).isEmpty)
  }

  test("orderStatAt picks the naive rank's value at every position") {
    val naive = df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")))
      .select(col("g"), col("rn").cast("long").as("pos"),
        col("v").as("expect"))
    // every position of every group, incl. many straddling one bucket
    val offs = Ranks.bucketOffsets(df, Seq("g"), expr("v div 5"))
    val positions = naive.select("g", "pos")
    val got = Ranks.orderStatAt(df, Seq("g"), expr("v div 5"),
      Seq(col("v"), col("id")), "v", offs, positions, "pos", "got")
    val joined = got.join(naive, Seq("g", "pos"))
    assert(joined.count() === 500)
    assert(joined.filter(col("got") =!= col("expect")).isEmpty)
  }

  test("rowNumber ranks NULL order keys first, exactly like the naive window") {
    // a null order key is legal input: the naive window sorts nulls
    // FIRST (Spark ascending), the null bucket sorts first in the
    // offsets prefix for the same reason, and the null-safe joins keep
    // the rows a plain using-join would silently drop
    val nd = spark.range(0, 60)
      .select(col("id"), (col("id") % 2).cast("string").as("g"),
        when(col("id") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("id") % 13).as("v"))
      .localCheckpoint(eager = true)
    val naive = nd.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")))
      .select(col("id"), col("g"), col("v"), col("rn").cast("long").as("rn"))
    val two = Ranks.rowNumber(nd, Seq("g"), expr("v div 5"),
      Seq(col("v"), col("id")), "rn")
      .select(col("id"), col("g"), col("v"), col("rn").cast("long").as("rn"))
    assert(two.count() === 60, "null-keyed rows must not be dropped")
    assert(naive.exceptAll(two).isEmpty && two.exceptAll(naive).isEmpty)
  }

  test("orderStatAt: no-part global order statistics + out-of-range pos") {
    val offs = Ranks.bucketOffsets(df, Seq(), expr("v div 5"))
    val n = Ranks.totals(offs, Seq()).as[Long].head()
    assert(n === 500L)
    val positions = Seq(1L, 250L, 500L, 0L, 501L).toDF("pos")
    val got = Ranks.orderStatAt(df, Seq(), expr("v div 5"),
      Seq(col("v"), col("id")), "v", offs, positions, "pos", "got")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // out-of-range positions yield no row
    assert(got.keySet === Set(1L, 250L, 500L))
    val sorted = df.orderBy("v", "id").select("v").as[Long].collect()
    assert(got(1L) === sorted(0) && got(250L) === sorted(249) &&
      got(500L) === sorted(499))
  }

  test("entry points REJECT inputs whose columns collide with scratch names") {
    // ADVICE r13: a caller frame already carrying _bkt/_off/_rn/_r_* was
    // silently overwritten or dropped — wrong ranks, no error. The
    // guards turn that into a loud require at build time.
    def expectReject(body: => Any, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    val bad = df.withColumn("_bkt", lit(1L))
    expectReject(Ranks.bucketOffsets(bad, Seq("g"), expr("v div 5")), "_bkt")
    expectReject(Ranks.rowNumber(bad, Seq("g"), expr("v div 5"),
      Seq(col("v")), "rn"), "_bkt")
    val badR = df.withColumn("_r_g", lit("x"))
    expectReject(Ranks.rowNumber(badR, Seq("g"), expr("v div 5"),
      Seq(col("v")), "rn"), "_r_g")
    expectReject(Ranks.rowNumber(df, Seq("g"), expr("v div 5"),
      Seq(col("v")), "_off"), "_off")
    val offs = Ranks.bucketOffsets(df, Seq(), expr("v div 5"))
    val badPos = Seq(1L).toDF("pos").withColumn("_rn", lit(0L))
    expectReject(Ranks.orderStatAt(df, Seq(), expr("v div 5"),
      Seq(col("v"), col("id")), "v", offs, badPos, "pos", "got"), "_rn")
    expectReject(Ranks.orderStatAt(df, Seq(), expr("v div 5"),
      Seq(col("v"), col("id")), "v", offs, Seq(1L).toDF("pos"), "pos",
      "_bc"), "_bc")
    // clean inputs still build (the guard must not over-reject)
    assert(Ranks.rowNumber(df, Seq("g"), expr("v div 5"),
      Seq(col("v"), col("id")), "rn").count() === 500)
  }
}
