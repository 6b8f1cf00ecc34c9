package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, DoubleType}

/** One collection target: a slave's snapshot endpoint
  * (`http://<host>:<port>/metrics/snapshot`,
  * /root/reference/syscol/metrics_reporter.go:112-115). */
case class SnapshotTarget(slaveId: String, hostname: String, port: Int)

/** A2 — the HTTP JSON scan, Spark-first: targets are a DataFrame, the
  * fetch runs per partition on the executors (one connection per target,
  * exactly the one-collector-per-slave layout scaled out), and the dynamic
  * JSON body is decoded schema-on-read with `from_json`.
  *
  * The fetch function is injected so tests (and this offline container)
  * plug a fake; production passes a real HTTP GET. The error posture
  * mirrors the reference: a failed fetch still emits a record with an
  * empty payload — no tick is skipped
  * (/root/reference/syscol/metrics_reporter.go:89-96).
  *
  * Scale: `mapPartitions` keeps one fetcher per task, no driver-side
  * collection; decode is codegen'd `from_json`. 100k targets across 1000
  * executors is ~100 fetches per task — embarrassingly parallel.
  */
object HttpSnapshotScan {

  /** Production fetcher: a plain `HttpURLConnection` GET with bounded
    * connect/read timeouts — JDK-only, one connection per call, closed on
    * every path. Lives here (not inline in a lambda) so the task closure
    * captures two ints, and so the timeout posture is part of the
    * operator's contract: an unresponsive slave costs one bounded wait,
    * never a hung task (the reference's client has the same role,
    * /root/reference/syscol/metrics_reporter.go:117-131). */
  def httpGet(connectTimeoutMs: Int = 2000, readTimeoutMs: Int = 5000)(
      url: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try {
      val is = conn.getInputStream
      try new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally is.close()
    } finally conn.disconnect()
  }

  /** Fetch each target's snapshot and decode the JSON body to a typed map.
    * `fetch` maps a URL to the raw body (default: [[httpGet]] over a real
    * socket); failures yield the empty object. */
  def scan(targets: Dataset[SnapshotTarget],
      fetch: String => String = httpGet()): DataFrame = {
    import targets.sparkSession.implicits._
    val fetched = targets.mapPartitions { it =>
      it.map { t =>
        val url = s"http://${t.hostname}:${t.port}/metrics/snapshot"
        val body =
          try fetch(url)
          catch { case _: Exception => "{}" } // emit empty payload, keep tick
        (t.slaveId, t.hostname, t.port, body)
      }
    }.toDF("slaveId", "hostname", "port", "body")
    fetched.withColumn("metrics",
      from_json(col("body"), MapType(StringType, DoubleType)))
  }
}
