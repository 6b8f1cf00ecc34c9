package graft.operators

import org.apache.spark.sql.SparkSession

/** Cluster-safe scratch paths for the at-rest layout writers and their
  * specs — ONE definition of the convention `q_scan_roundtrip` first
  * established (graft/queries/Filters.scala): when `SPARK_GRAFT_SCRATCH`
  * is set, paths are minted under that root, which on a cluster MUST be a
  * shared filesystem (hdfs/s3a/…) — executors write shards that the
  * driver and later readers must see, and a bare /tmp would be per-node
  * local, scattering invisible fragments. Unset, a driver-local temp dir
  * is minted — correct under local[*], where driver and executors share
  * one filesystem.
  *
  * The layout writers themselves (`Similarity.writeIvfLayout` /
  * `writePqLayout`, `Layout.writeZOrdered`, `Dedup.signatureStore`'s
  * callers) take caller-chosen paths; this helper is how callers and
  * specs mint those paths without silently assuming driver-local /tmp.
  */
object Scratch {

  /** A fresh scratch directory path:
    * `$SPARK_GRAFT_SCRATCH/<prefix>_<uuid>` when the shared root is
    * configured (the path is minted, NOT created — Spark writers create
    * on write), else a driver-local temp dir (which
    * `createTempDirectory` does create — harmless for the overwrite-mode
    * writers this helper serves). Paths may carry a non-local scheme:
    * consumers must go through the Hadoop FS API, never java.io.File. */
  def dir(prefix: String): String = sys.env.get("SPARK_GRAFT_SCRATCH") match {
    case Some(root) => s"$root/${prefix}_${java.util.UUID.randomUUID()}"
    case None => java.nio.file.Files.createTempDirectory(prefix).toString
  }

  /** Recursive delete through the Hadoop FS API — handles local AND
    * shared (hdfs/s3a) roots alike. */
  def delete(spark: SparkSession, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hp, true)
    ()
  }
}
