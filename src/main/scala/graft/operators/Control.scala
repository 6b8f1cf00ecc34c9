package graft.operators

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.streaming.StreamingQuery

/** Control-plane analog of the reference's REST scheduler API (SURVEY.md §2
  * A19–A21): runtime config upsert with merge-non-empty semantics, start /
  * stop verbs over streaming queries, and a status snapshot.
  *
  * Semantics mirrored deliberately:
  * - `update` merges only non-empty params into the config singleton
  *   (/root/reference/syscol/http_server.go:70-79,102-107; empty params
  *   omitted, /root/reference/syscol/api.go:38-43).
  * - config is FROZEN into a query at start — later updates affect only
  *   queries started afterwards, exactly like task-launch-frozen config
  *   (/root/reference/syscol/scheduler.go:213-228) — there is no push to
  *   running queries.
  * - `canStart` gates activation on required keys
  *   (/root/reference/syscol/config.go:60-65: topic + producer props;
  *   registry url when the transform is avro).
  */
class Control {
  private val conf = TrieMap[String, String](
    "transform" -> "none", "namespace" -> "prod")
  private val queries = TrieMap.empty[String, StreamingQuery]

  /** Merge non-empty params; empty values leave the existing entry. */
  def update(params: Map[String, String]): Map[String, String] = {
    params.foreach { case (k, v) => if (v.nonEmpty) conf.put(k, v) }
    snapshotConf
  }

  def snapshotConf: Map[String, String] = conf.toMap

  /** Activation gate: sink target required; registry only for avro. */
  def canStart: Either[String, Unit] = {
    if (!conf.contains("topic")) Left("topic required")
    else if (conf.get("transform").contains("avro") &&
      !conf.contains("schema.registry.url"))
      Left("schema.registry.url required for avro transform")
    else Right(())
  }

  /** Start verb: freeze the current config into the query built by
    * `build`. Refuses double-start per name (one live task per key — the
    * Cluster gate). */
  def start(name: String)(build: Map[String, String] => StreamingQuery):
      Either[String, StreamingQuery] =
    canStart.flatMap { _ =>
      if (queries.get(name).exists(_.isActive)) Left(s"$name already running")
      else {
        val q = build(snapshotConf)
        queries.put(name, q)
        Right(q)
      }
    }

  /** Stop verb; removing the key frees the name for a restart. */
  def stop(name: String): Boolean =
    queries.remove(name) match {
      case Some(q) => if (q.isActive) q.stop(); true
      case None => false
    }

  /** Status snapshot: (name, isActive, lastProgress batchId). */
  def status: Seq[(String, Boolean, Long)] =
    queries.toSeq.map { case (n, q) =>
      (n, q.isActive, Option(q.lastProgress).map(_.batchId).getOrElse(-1L))
    }.sortBy(_._1)
}
