package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that every scan benefits from
  * parquet column pruning + predicate pushdown (Catalyst handles both as long
  * as we stay declarative). At 100 TB these would be partitioned/bucketed
  * tables behind a catalog; the single-parquet layout is the test substrate.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan-parallelism repair (optimization r14, guide §2.5 "input skew: one
    * huge unsplittable file … repartition immediately after the read"): the
    * driver's test parquet is ONE row group per table, so a bare scan yields
    * ONE non-empty split and every per-row expression in the scan stage
    * (decimal moments, tokenize+shingle explodes, hash kernels) runs
    * single-threaded regardless of `local[N]` — jstack-confirmed (31 of 32
    * executor threads parked through q_corr's moment aggregate; 6.6 s
    * single-task vs 2.2 s repartitioned).
    *
    * OPT-IN, not applied in [[load]]: a round-robin exchange changes which
    * physical row arrives first at a downstream sort, and a handful of
    * row-emitting queries order by keys the generated data does not keep
    * unique (e.g. duplicate (l_orderkey, l_linenumber) pairs made
    * q_scan_parquet/q_math_funcs tie-swap against the oracle — caught by the
    * sf0.01 gate when this was briefly a blanket load() rule). Callers must
    * therefore be ORDER-IMMUNE: their output a pure function of the input
    * MULTISET (exact integer aggregates, value-histogram ranks, count-keyed
    * joins) — the repo's stated design discipline for every statistical
    * operator. The repair is also scale-adaptive rather than a local-mode
    * constant: it fires only when the planned scan has fewer splits than
    * the session's default parallelism, so at production scale (many row
    * groups/files ⇒ splits ≥ cores) it is a no-op by construction;
    * sortBeforeRepartition stays ON, so task retries are deterministic
    * (SPARK-38388). */
  def parallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has been generated in multiple parquet encodings across
    * driver runs; this loader normalizes every one of them to TimestampType
    * (micros, UTC session) so downstream `unix_micros(ts)` sites never care:
    *
    *  - TIMESTAMP(NANOS): Spark 4 has no default mapping
    *    ([PARQUET_TYPE_ILLEGAL]); read as raw nanos via the legacy conf, then
    *    integer-divide to micros (`div` — double division loses precision
    *    above 2^53, and ns epochs are ~1.7e18).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ by default; cast to TimestampType. Sessions are pinned
    *    to UTC (build.sbt / Verify / Bench), so the cast is value-exact and
    *    matches what DuckDB reads for the oracle.
    *  - TIMESTAMP(MICROS, adjusted): already TimestampType — pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", raw("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so a SQL-ONLY consumer can drive
    * the engine through `spark.sql(...)` alone — the SQL twin of the Scala
    * registry, mirroring how the reference exposed its control surface over
    * HTTP rather than a host-language API. Views go through the SAME
    * loaders as the Scala queries (the events timestamp normalization
    * included), so SQL and Scala read identical data. Canonical examples
    * live in README.md §"SQL entry point" and are smoke-tested in
    * SqlSurfaceSpec. */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem").foreach(n => load(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
    documents(s, d).createOrReplaceTempView("documents")
    embeddings(s, d).createOrReplaceTempView("embeddings")
  }

  /** Register an at-rest IVF-PQ layout (written by
    * `Similarity.writeIvfPqLayout`) as `<prefix>_codes` / `<prefix>_cells`
    * / `<prefix>_codebooks` temp views. `<prefix>_codes` is the COMMITTED
    * SERVING SNAPSHOT — base ∪ committed streaming deltas, the exact
    * definition `Similarity.probeIvfPqLayoutAll` serves — so a SQL
    * consumer reads the same index the Scala probe does, and can run the
    * whole ANN read path via `Similarity.annProbeSql` without touching
    * the Scala API (README §"SQL entry point"; parity is spec-proven in
    * SqlSurfaceSpec). */
  def registerLayoutViews(s: SparkSession, layoutDir: String,
      prefix: String = "ann"): Unit = {
    graft.operators.Similarity.committedCodes(s, layoutDir)
      .createOrReplaceTempView(s"${prefix}_codes")
    Seq("cells", "codebooks").foreach { n =>
      s.read.parquet(s"$layoutDir/$n").createOrReplaceTempView(s"${prefix}_$n")
    }
  }

  /** Register an at-rest MinHash signature store (the `Dedup
    * .signatureStore` format, grown by `Streams.nearDedupSinkBatch`
    * deltas) as a temp view `(doc, shingles, bk)` — the store side of the
    * near-dedup read path, so a SQL-only consumer can run
    * `Dedup.nearDupProbeSql` against it. */
  def registerSignatureStoreView(s: SparkSession, storeDir: String,
      name: String = "sig_store"): Unit =
    graft.operators.DeltaStore.snapshotPureDelta(s, storeDir)
      .getOrElse(throw new IllegalArgumentException(
        s"no signature store at $storeDir"))
      .select("doc", "shingles", "bk")
      .createOrReplaceTempView(name)
}
