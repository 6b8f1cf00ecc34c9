package graft

import org.apache.spark.sql.functions.col

/** The README §"SQL entry point" examples, run VERBATIM: the spec extracts
  * the ```sql block from README.md and executes every statement through
  * `spark.sql(...)` over `Tables.registerViews` + `registerLayoutViews`,
  * so the documented SQL surface cannot drift from what actually runs —
  * a stale example fails the suite, not a user. */
class SqlSurfaceSpec extends SparkSpec {

  private def readmeSql(): Seq[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val block = "(?s)```sql\\n(.*?)```".r.findFirstMatchIn(text)
      .getOrElse(fail("README.md has no ```sql block")).group(1)
    block.split(";").map(_.trim).filter(_.nonEmpty).toSeq
  }

  test("every README SQL example runs and returns rows over the temp views") {
    Tables.registerViews(spark, sf)
    // the layout example needs an at-rest index; build a tiny one
    val layout = java.nio.file.Files.createTempDirectory("sqlsurface").toString
    graft.operators.Similarity.writeIvfPqLayout(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"),
      layout, nCells = 4)
    Tables.registerLayoutViews(spark, layout)
    val stmts = readmeSql()
    assert(stmts.size >= 4, s"expected >= 4 examples, got ${stmts.size}")
    stmts.foreach { sql =>
      val rows = spark.sql(sql).collect()
      assert(rows.nonEmpty, s"README example returned 0 rows:\n$sql")
    }
  }

  test("SQL and Scala registries read identical data through the views") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      "SELECT count(*) AS n, sum(l_quantity) AS q FROM lineitem").collect()(0)
    val viaScala = Tables.lineitem(spark, sf)
      .selectExpr("count(*) AS n", "sum(l_quantity) AS q").collect()(0)
    assert(viaSql === viaScala)
    // the events view carries the SAME normalized timestamp type the
    // Scala loader produces (the multi-encoding parquet gotcha)
    assert(spark.table("events").schema("ts").dataType ===
      Tables.events(spark, sf).schema("ts").dataType)
  }
}
