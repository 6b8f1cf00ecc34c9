package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** B-8 scalar function families (SURVEY.md §2).
  *
  * Each query exercises one family of codegen'd built-ins over the test
  * tables — no UDFs anywhere, so every expression stays inside
  * WholeStageCodegen and the scan still gets column pruning (only the
  * referenced columns reach ReadSchema).
  *
  * Oracle parity notes (Spark vs DuckDB, both verified empirically):
  * - `length`/`size`/`year`… return INT in Spark, BIGINT in DuckDB — Spark
  *   side casts to long.
  * - decimal `round` is HALF_UP in both; double `round` is not comparable —
  *   money is rounded in decimal only.
  * - libm-dependent fns (ln/exp/pow with fractional exponents) can differ by
  *   1 ulp between JVM and C — kept out of oracle columns; `sqrt` is IEEE
  *   correctly-rounded and `pow(x, 2)` on small integral doubles is exact,
  *   both safe.
  * - DuckDB list slicing `l[1:3]` is 1-based inclusive = Spark
  *   `slice(l, 1, 3)`.
  * - engine-defined `hash`/`xxhash64` are Spark-specific — never oracled;
  *   md5/sha2 are algorithm-defined and compare as hex strings.
  */
object ScalarFuncs extends QueryFamily {

  /** q_str_funcs — split/substring/suffix/strip/case/pad, mirroring the
    * reference's string surgery: task-id → slave-id extraction (split +
    * fixed-suffix strip, /root/reference/syscol/scheduler.go:256-262), last-5
    * id abbreviation (`suffix`, /root/reference/syscol/utils.go:30-36), and
    * scheme-prefix strip (`listenAddr`, /root/reference/syscol/scheduler.go:264-276).
    */
  def qStrFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
        regexp_replace(col("c_name"), "^Customer#0*", "").as("stripped"),
        expr("right(c_name, 5)").as("suffix5"),
        concat_ws("-", col("c_mktsegment"), expr("right(c_name, 5)")).as("tag"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("id_pad"))
      .orderBy("c_custkey")

  /** q_str_funcs2 — second string family: translate/reverse/repeat/
    * instr/left/regexp group extraction. */
  def qStrFuncs2(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .select(
        col("s_suppkey"),
        translate(col("s_name"), "Sup", "Zyx").as("translated"),
        reverse(col("s_name")).as("reversed"),
        repeat(expr("right(s_name, 2)"), 3).as("repeated"),
        instr(col("s_name"), "#").cast("long").as("hash_pos"),
        expr("left(s_name, 8)").as("prefix8"),
        regexp_extract(col("s_name"), "([0-9]+)", 1).as("num_part"))
      .orderBy("s_suppkey")

  /** q_date_funcs — extract/trunc/diff on order dates. */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"))
      .orderBy("o_orderkey")

  /** q_math_funcs — arithmetic + rounding on prices; the revenue expression
    * `price*(1-disc)*(1+tax)` in exact decimal. */
  def qMathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")) *
          (lit(1) + col("l_tax").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double")
          .as("price_r1"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        floor(col("l_extendedprice") / 100).cast("long").as("price_floor"),
        ceil(col("l_extendedprice") / 100).cast("long").as("price_ceil"),
        (col("l_orderkey") % 7).as("key_mod"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_discount") * 100).as("l"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q_array_funcs — length/access/slice/reduce over embedding vectors.
    * `norm_sq` is the self-dot-product — the building block of the cosine
    * similarity path (B-10) — computed with `aggregate`, left-to-right in
    * double, matching DuckDB's list_sum over a transformed DOUBLE list.
    * The slice is projected element-wise (head3_2/head3_3) rather than as an
    * array column: the driver's checker sorts rows in pandas and array cells
    * are unhashable; scalar floats compare exactly. */
  def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        element_at(col("embedding"), 1).as("first_dim"),
        element_at(col("embedding"), -1).as("last_dim"),
        element_at(slice(col("embedding"), 1, 3), 2).as("head3_2"),
        element_at(slice(col("embedding"), 1, 3), 3).as("head3_3"),
        array_max(col("embedding")).as("max_dim"),
        array_min(col("embedding")).as("min_dim"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
          .as("norm_sq"))
      .orderBy("vec_id")

  /** q_map_funcs — dynamic JSON payload → typed map: keys/lookup/size.
    * Root: A3 (schema-on-read decode of the metrics snapshot map,
    * /root/reference/syscol/metrics_reporter.go:125). The key list is
    * emitted sorted and comma-joined (a canonical string) so the driver's
    * pandas checker can hash the rows — array cells are unhashable. */
  def qMapFuncs(s: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
    Tables.events(s, dir)
      .select(
        col("event_id"),
        size(map_keys(m)).cast("long").as("n_keys"),
        array_join(sort_array(map_keys(m)), ",").as("keys"),
        element_at(m, "k").as("k_val"),
        array_contains(map_keys(m), "k").as("has_k"))
      .orderBy("event_id")
  }

  /** q_json_funcs — JSON path extraction + canonical re-serialization.
    * Root: A3/A5 (dynamic decode + JSON serialize,
    * /root/reference/syscol/metrics_reporter.go:125,143-148). */
  def qJsonFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("jk"),
        get_json_object(col("props"), "$.k").as("k_str"),
        length(col("props")).cast("long").as("raw_len"),
        to_json(from_json(col("props"), org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)))
          .as("canonical"))
      .orderBy("event_id")

  /** q_json_variant — Spark 4 VariantType path for fully-dynamic JSON
    * (SURVEY §1.2): parse once into the binary variant encoding, then typed
    * path extraction and canonical re-serialization. This is the engine's
    * schema-on-read answer when payload keys are unknown at compile time
    * (the reference's `map[string]interface{}` decode,
    * /root/reference/syscol/metrics_reporter.go:125). */
  def qJsonVariant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("vk"),
        expr("cast(parse_json(props) as string)").as("vjson"))
      .orderBy("event_id")

  /** q_hash_funcs — algorithm-defined digests over document text.
    * Root: A7 (Confluent framing hashes/ids) + A11 (keyed partitioning,
    * /root/reference/Godeps/_workspace/src/github.com/elodina/siesta-producer/partitioner.go:27-44).
    * Engine-defined `hash` lives in q_hash_partition (not oracle-able). */
  def qHashFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_hex"),
        sha2(col("text"), 256).as("sha256_hex"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy("doc_id")

  /** q_pivot — pivoted conditional aggregation: per-nation customer counts
    * by market segment as columns (Spark `pivot` plans the same single
    * hash-aggregate as the CASE formulation the oracle uses). */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .na.fill(0L, segs)
      .orderBy("c_nationkey")
  }

  /** q_unpivot — wide→long reshape (the inverse of q_pivot): lineitem's
    * four numeric measures melt into (metric, value) rows, then a
    * per-metric profile. Plans as a single Expand node — a NARROW 4×
    * row multiplication that inherits the scan partitioning (no shuffle
    * until the metric aggregate, which is 4 groups of map-side
    * partials). Sums in DECIMAL(18,2) so the per-metric totals are
    * order-immune. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        min("value").as("min_v"), max("value").as("max_v"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .orderBy("metric")

  /** q_explode_tokens — table-generating positional explode (posexplode):
    * one row per (doc, position, token). Bounded to the first docs so the
    * output stays a correctness fixture, not a data dump. */
  def qExplodeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 10)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")

  /** q_null_funcs — null-handling family: coalesce / nullif / nvl2-shape /
    * null-safe equality over the full-outer join's null-extended rows. */
  def qNullFuncs(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
    val sp = Tables.supplier(s, dir).groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"))
    c.join(sp, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        nullif(col("n_cust"), lit(0L)).as("cust_or_null"),
        when(col("n_supp").isNull, lit("no_suppliers"))
          .otherwise(lit("has_suppliers")).as("supp_status"),
        (col("c_nationkey") <=> col("s_nationkey")).as("both_present"))
      .orderBy("nationkey")
  }

  /** q_hash_partition — partition assignment analog of the reference's
    * producer partitioner (A11) in the engine-native hash: partition =
    * pmod(hash(key), n). Spark's `hash` is Murmur3 x86_32 (seed 42,
    * hashLong over the two 32-bit halves) — algorithm-DEFINED even though
    * engine-NATIVE, so since r14 the DuckDB oracle re-derives the full
    * mix/rotate/fmix pipeline from first principles (HUGEINT for the
    * 32×32-bit multiplies), the same cross-engine discipline that oracles
    * FNV-1a below. pmod(h, 32) = unsigned(h) % 32 (two's-complement low
    * five bits), which the oracle exploits to skip the signed reconstruct.
    * Contract: non-null keys (Spark folds a null key to the seed, 42 →
    * part 10, while the oracle's arithmetic nulls out — the events table
    * guarantees user_id NOT NULL at every tested scale).
    * This is exactly the hash-partitioning a 100 TB keyed sink shuffles on. */
  def qHashPartition(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(pmod(hash(col("user_id")), lit(32)).as("part"))
      .groupBy("part")
      .agg(count(lit(1)).as("n"))
      .orderBy("part")

  /** q_hash_partition_fnv — the same partition histogram with the
    * REFERENCE-EXACT placement: abs(FNV-1a-32(key bytes)) mod 32, the
    * siesta-producer hash partitioner byte-for-byte
    * (/root/reference/Godeps/_workspace/src/github.com/elodina/siesta-producer/partitioner.go:27-44).
    * FNV-1a is algorithm-defined (unlike Murmur3's engine-specific seeds),
    * so the DuckDB oracle recomputes it from first principles — a full
    * cross-engine check of the custom codegen expression. */
  def qHashPartitionFnv(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(graft.functions.HashFunctions.fnvPartition(
        col("user_id").cast("string").cast("binary"), 32).as("part"))
      .groupBy("part")
      .agg(count(lit(1)).as("n"))
      .orderBy("part")

  /** q_uuid — A18: RFC-4122 v4 id per document, the reference's per-message
    * uuid (github.com/pborman/uuid in the Go producer). Non-deterministic by
    * construction → registered rows-only; distinctness + format are
    * asserted in ApproxSpec. */
  def qUuid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), expr("uuid()").as("id"))
      .orderBy("doc_id")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_uuid" -> (qUuid _),
    "q_str_funcs" -> (qStrFuncs _),
    "q_str_funcs2" -> (qStrFuncs2 _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_json_funcs" -> (qJsonFuncs _),
    "q_json_variant" -> (qJsonVariant _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_explode_tokens" -> (qExplodeTokens _),
    "q_null_funcs" -> (qNullFuncs _),
    "q_hash_funcs" -> (qHashFuncs _),
    "q_hash_partition" -> (qHashPartition _),
    "q_hash_partition_fnv" -> (qHashPartitionFnv _))

  override val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT c_custkey,
        |  split_part(c_name, '#', 2) AS name_num,
        |  regexp_replace(c_name, '^Customer#0*', '') AS stripped,
        |  right(c_name, 5) AS suffix5,
        |  concat_ws('-', c_mktsegment, right(c_name, 5)) AS tag,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  length(c_name) AS name_len,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS id_pad
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_str_funcs2" ->
      """SELECT s_suppkey,
        |  translate(s_name, 'Sup', 'Zyx') AS translated,
        |  reverse(s_name) AS reversed,
        |  repeat(right(s_name, 2), 3) AS repeated,
        |  strpos(s_name, '#') AS hash_pos,
        |  left(s_name, 8) AS prefix8,
        |  regexp_extract(s_name, '([0-9]+)', 1) AS num_part
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  dayofmonth(o_orderdate) AS o_day,
        |  quarter(o_orderdate) AS o_quarter,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  last_day(o_orderdate) AS month_end,
        |  datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  pow(l_quantity, 2) AS qty_sq,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil,
        |  l_orderkey % 7 AS key_mod,
        |  greatest(l_quantity, l_discount * 100) AS g,
        |  least(l_quantity, l_discount * 100) AS l
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS n_dims,
        |  embedding[1] AS first_dim,
        |  embedding[-1] AS last_dim,
        |  (embedding[1:3])[2] AS head3_2,
        |  (embedding[1:3])[3] AS head3_3,
        |  list_aggregate(embedding, 'max') AS max_dim,
        |  list_aggregate(embedding, 'min') AS min_dim,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |  len(json_keys(props)) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  list_contains(json_keys(props), 'k') AS has_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS jk,
        |  json_extract_string(props, '$.k') AS k_str,
        |  length(props) AS raw_len,
        |  CAST(json_extract(props, '$') AS VARCHAR) AS canonical
        |FROM events ORDER BY event_id""".stripMargin,
    "q_pivot" ->
      """SELECT c_nationkey,
        |  COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS "AUTOMOBILE",
        |  COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS "BUILDING",
        |  COUNT(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS "FURNITURE",
        |  COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS "HOUSEHOLD",
        |  COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS "MACHINERY"
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_unpivot" ->
      """WITH long AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM long GROUP BY metric ORDER BY metric""".stripMargin,
    "q_explode_tokens" ->
      """SELECT doc_id, i - 1 AS pos, ws[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |      FROM documents WHERE doc_id < 10),
        |  range(1, 1000) t(i)
        |WHERE i <= len(ws)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_null_funcs" ->
      """SELECT
        |  COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust,
        |  COALESCE(n_supp, 0) AS n_supp,
        |  NULLIF(n_cust, 0) AS cust_or_null,
        |  CASE WHEN n_supp IS NULL THEN 'no_suppliers'
        |       ELSE 'has_suppliers' END AS supp_status,
        |  c_nationkey IS NOT DISTINCT FROM s_nationkey AS both_present
        |FROM
        |  (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |FULL JOIN
        |  (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
        |ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_json_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS vk,
        |  CAST(json_extract(props, '$') AS VARCHAR) AS vjson
        |FROM events ORDER BY event_id""".stripMargin,
    "q_hash_funcs" ->
      """SELECT doc_id,
        |  md5(text) AS md5_hex,
        |  sha256(text) AS sha256_hex,
        |  length(text) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_hash_partition" ->
      // Spark Murmur3_x86_32.hashLong(user_id, seed=42), re-derived step
      // by step: per 32-bit half k1 = rotl15(k*0xcc9e2d51)*0x1b873593,
      // h1 = rotl13(h1 xor k1)*5 + 0xe6546b64, then fmix(h1 xor 8).
      // HUGEINT carries the 32x32-bit products; rotates add their two
      // disjoint halves instead of OR-ing. part = unsigned(h) % 32
      // (= Spark's pmod over the signed int: low 5 bits agree).
      """WITH u64 AS (
        |  SELECT ((user_id::HUGEINT % 18446744073709551616)
        |    + 18446744073709551616) % 18446744073709551616 AS u FROM events),
        |halves AS (SELECT u % 4294967296 AS lo, u // 4294967296 AS hi FROM u64),
        |k1a AS (SELECT hi, (lo * 3432918353) % 4294967296 AS k FROM halves),
        |k1b AS (SELECT hi, ((k * 32768) % 4294967296 + k // 131072) AS kr FROM k1a),
        |k1c AS (SELECT hi, (kr * 461845907) % 4294967296 AS k1 FROM k1b),
        |h1a AS (SELECT hi, xor(42::HUGEINT, k1) AS hx FROM k1c),
        |h1b AS (SELECT hi, ((hx * 8192) % 4294967296 + hx // 524288) AS hr FROM h1a),
        |h1c AS (SELECT hi, (hr * 5 + 3864292196) % 4294967296 AS h1 FROM h1b),
        |k2a AS (SELECT h1, (hi * 3432918353) % 4294967296 AS k2m FROM h1c),
        |k2b AS (SELECT h1, ((k2m * 32768) % 4294967296 + k2m // 131072) AS k2r FROM k2a),
        |k2c AS (SELECT h1, (k2r * 461845907) % 4294967296 AS k2 FROM k2b),
        |h2a AS (SELECT xor(h1, k2) AS hx2 FROM k2c),
        |h2b AS (SELECT ((hx2 * 8192) % 4294967296 + hx2 // 524288) AS hr2 FROM h2a),
        |h2c AS (SELECT (hr2 * 5 + 3864292196) % 4294967296 AS h2 FROM h2b),
        |f2 AS (SELECT xor(xor(h2, 8), xor(h2, 8) // 65536) AS fb FROM h2c),
        |f3 AS (SELECT (fb * 2246822507) % 4294967296 AS fc FROM f2),
        |f4 AS (SELECT xor(fc, fc // 8192) AS fd FROM f3),
        |f5 AS (SELECT (fd * 3266489909) % 4294967296 AS fe FROM f4),
        |f6 AS (SELECT xor(fe, fe // 65536) AS h FROM f5)
        |SELECT (h % 32)::BIGINT AS part, COUNT(*) AS n
        |FROM f6 GROUP BY part ORDER BY part""".stripMargin,
    "q_hash_partition_fnv" ->
      """WITH h AS (
        |  SELECT list_reduce(
        |    list_prepend(2166136261::BIGINT,
        |      list_transform(range(1, length(CAST(user_id AS VARCHAR)) + 1),
        |        i -> ord(substr(CAST(user_id AS VARCHAR), i, 1))::BIGINT)),
        |    (acc, b) -> (xor(acc, b) * 16777619) % 4294967296) AS hu
        |  FROM events),
        |s AS (
        |  SELECT CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END AS hs
        |  FROM h)
        |SELECT (CASE WHEN hs < 0 THEN -hs ELSE hs END) % 32 AS part,
        |  COUNT(*) AS n
        |FROM s GROUP BY part ORDER BY part""".stripMargin)
}
