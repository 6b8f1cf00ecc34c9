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

  test("SQL ANN probe over the layout views ≡ probeIvfPqLayoutAll (deltas included)") {
    import graft.operators.Similarity
    import spark.implicits._
    val layout = java.nio.file.Files.createTempDirectory("sql_ann").toString
    val emb = Tables.embeddings(spark, sf)
    // base from even ids, one committed streaming delta from odd ids —
    // the SQL view must serve the SAME committed snapshot the Scala
    // probe serves, not the base alone
    Similarity.writeIvfPqLayout(
      emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding"),
      layout, nCells = 4)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding")
    graft.streaming.Streams.annIngestSinkBatch(layout)(odd, 0L)
    Tables.registerLayoutViews(spark, layout)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.select("vec_id", "embedding")
    queries.createOrReplaceTempView("ann_q")
    corpus.createOrReplaceTempView("ann_corpus")
    // generous shortlist: the SQL ADC sum is unordered, so last-ulp float
    // drift may reorder shortlist TIES — final top-k must not depend on a
    // truncation-tight shortlist (the Scala probe gets the same factor)
    val scala_ = Similarity.probeIvfPqLayoutAll(layout, queries, corpus,
        k = 5, nProbe = 2, shortlistFactor = 1000)
      .select("q_id", "rnk", "vec_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaSql = spark.sql(Similarity.annProbeSql("ann_q", "ann_corpus",
        k = 5, nProbe = 2, shortlistFactor = 1000))
      .select("q_id", "rnk", "vec_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaSql === scala_)
    assert(viaSql.nonEmpty)
  }

  test("SQL near-dedup probe over the signature-store view ≡ incrementalNearAgainst") {
    import graft.operators.Dedup
    import spark.implicits._
    val storeDir = java.nio.file.Files.createTempDirectory("sql_sig").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // store grows as deltas — exactly the S15 at-rest layout
    Dedup.signatureStore(docs.filter(col("doc_id") % 3 === 0),
        "text", "doc_id")
      .write.mode("overwrite").parquet(s"$storeDir/delta=0")
    Dedup.signatureStore(docs.filter(col("doc_id") % 3 === 1),
        "text", "doc_id")
      .write.mode("overwrite").parquet(s"$storeDir/delta=1")
    Tables.registerSignatureStoreView(spark, storeDir)
    val batch = docs.filter(col("doc_id") % 3 === 2)
    batch.createOrReplaceTempView("batch_docs")
    val storeSigs = spark.table("sig_store")
    val scala_ = Dedup.incrementalNearAgainst(batch, storeSigs,
        "text", "doc_id", maxDistance = 0.6)
      .as[(Long, Option[Long], Option[Double], Boolean)].collect().toSet
    val viaSql = spark.sql(Dedup.nearDupProbeSql("batch_docs", "sig_store",
        maxDistance = 0.6))
      .as[(Long, Option[Long], Option[Double], Boolean)].collect().toSet
    assert(viaSql === scala_)
    // the batch has real near-dups against the store at this threshold —
    // a vacuously-all-novel comparison would prove nothing
    assert(scala_.exists(!_._4), "fixture must contain at least one near-dup")
  }

  test("generated-SQL entry points reject non-identifier view names") {
    import graft.operators.{Dedup, Similarity}
    intercept[IllegalArgumentException] {
      Similarity.annProbeSql("q; DROP TABLE x", "corpus", k = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.annProbeSql("q", "corpus", k = 5, prefix = "ann-codes")
    }
    intercept[IllegalArgumentException] {
      Dedup.nearDupProbeSql("batch docs", "sig_store", 0.5)
    }
    intercept[IllegalArgumentException] { // bad parameter, named error
      Dedup.nearDupProbeSql("batch_docs", "sig_store", 1.5)
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
