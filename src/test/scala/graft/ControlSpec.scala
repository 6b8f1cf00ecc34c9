package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Control
import graft.streaming.Tick

/** Control-plane semantics (A19–A21): merge-non-empty updates, activation
  * gates, frozen-at-start config, one-live-query-per-name. */
class ControlSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("update merges only non-empty params") {
    val c = new Control
    c.update(Map("topic" -> "metrics", "transform" -> ""))
    assert(c.snapshotConf("topic") === "metrics")
    assert(c.snapshotConf("transform") === "none") // empty param ignored
  }

  test("canStart gates on topic, and registry url for avro") {
    val c = new Control
    assert(c.canStart.isLeft)
    c.update(Map("topic" -> "metrics"))
    assert(c.canStart.isRight)
    c.update(Map("transform" -> "avro"))
    assert(c.canStart === Left("schema.registry.url required for avro transform"))
    c.update(Map("schema.registry.url" -> "stub://local"))
    assert(c.canStart.isRight)
  }

  test("config freezes at start; double start refused; stop frees the name") {
    val c = new Control
    c.update(Map("topic" -> "metrics"))
    val in = MemoryStream[Tick]
    var frozen: Map[String, String] = Map.empty
    def build(conf: Map[String, String]) = {
      frozen = conf
      in.toDF().writeStream.format("memory")
        .queryName("ctl_q_" + System.nanoTime()).start()
    }
    val started = c.start("collector")(build)
    assert(started.isRight)
    assert(frozen("topic") === "metrics")
    // later update does NOT reach the running query's frozen conf
    c.update(Map("topic" -> "other"))
    assert(frozen("topic") === "metrics")
    // one live query per name
    assert(c.start("collector")(build) === Left("collector already running"))
    assert(c.status.map(s => (s._1, s._2)) === Seq(("collector", true)))
    assert(c.stop("collector"))
    assert(!c.stop("collector")) // already removed
    // name free again
    val restarted = c.start("collector")(build)
    assert(restarted.isRight)
    assert(frozen("topic") === "other") // restart sees the updated config
    c.stop("collector")
  }

  test("A19: a RUNNING query's output keeps launch-time conf across " +
      "Control.update; only a restart picks up the new value") {
    // The reference freezes config into a task at LAUNCH
    // (/root/reference/syscol/scheduler.go:213-228): a live collector keeps
    // emitting under the conf it started with, however the scheduler's
    // config mutates afterwards. The frozen-build-map test above pins the
    // plumbing; this one pins the BEHAVIOR — rows produced after the
    // update still carry the launch-time namespace.
    import org.apache.spark.sql.functions._
    val c = new Control
    c.update(Map("topic" -> "metrics", "namespace" -> "ns_v1"))
    val in = MemoryStream[Tick]
    val sinkName = "ctl_frozen_" + System.nanoTime()
    def build(conf: Map[String, String]) =
      in.toDF()
        .select(concat(lit(conf("namespace")), lit("/"), col("slaveId"))
          .as("key"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
    val q = c.start("collector")(build).toOption.get
    in.addData(Tick("s1", new java.sql.Timestamp(1000L), 1.0, "{}"))
    q.processAllAvailable()
    // conf mutates while the query RUNS...
    c.update(Map("namespace" -> "ns_v2"))
    in.addData(Tick("s2", new java.sql.Timestamp(2000L), 2.0, "{}"))
    q.processAllAvailable()
    // ...and the post-update row still carries the LAUNCH namespace
    val live = spark.table(sinkName).as[String].collect().sorted
    assert(live === Array("ns_v1/s1", "ns_v1/s2"))
    assert(c.snapshotConf("namespace") === "ns_v2") // update did land
    // only a stop + restart picks the new value up
    assert(c.stop("collector"))
    spark.sql(s"DROP TABLE IF EXISTS $sinkName")
    val q2 = c.start("collector")(build).toOption.get
    in.addData(Tick("s3", new java.sql.Timestamp(3000L), 3.0, "{}"))
    q2.processAllAvailable()
    assert(spark.table(sinkName).as[String].collect().sorted
      .contains("ns_v2/s3"))
    c.stop("collector")
  }
}
