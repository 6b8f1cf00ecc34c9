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
}
