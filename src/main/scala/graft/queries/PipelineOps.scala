package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Layout, LmScore, Ranking}

/** Round-4 additions to the training-data-pipeline surface: unigram-LM
  * quality scoring, TF-IDF keyword extraction, incremental (batch-vs-store)
  * dedup, and Z-order multi-dimensional clustering. Oracle discipline
  * follows CorpusOps: float-valued signals are quantized to integer micro
  * units BEFORE any aggregate or rank, so both engines do exact integer
  * arithmetic where summation order could otherwise flip a rounded digit.
  */
object PipelineOps extends QueryFamily {

  /** q_unigram_lm — CCNet-style perplexity proxy: per-document mean
    * negative log-likelihood under the corpus's own unigram distribution
    * (top-1000-token vocabulary, OOV floored at 1/total). High ce_micro =
    * rare-token-heavy document; the standard model-free quality signal
    * between heuristic filters and a real LM. Vocabulary broadcasts; the
    * corpus shuffles only for the token count and the per-doc aggregate. */
  def qUnigramLm(s: SparkSession, dir: String): DataFrame =
    LmScore.unigramCrossEntropy(Tables.documents(s, dir), "text", "doc_id",
      vocabSize = 1000)
      .orderBy("doc_id")

  /** q_tfidf_terms — top-3 keywords per document by tf·ln(N/df), term
    * tie-break: the per-document topic signal (vs q_bm25, which ranks
    * documents for a query). Integer micro-unit scores make the ranking
    * float-order-immune. */
  def qTfidfTerms(s: SparkSession, dir: String): DataFrame =
    Ranking.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rk")

  /** q_dedup_incremental — the nightly-ingest dedup shape: a new batch
    * (doc_id % 3 == 0) dedups within itself (keep lowest id per sha256
    * digest), then anti-joins the digest STORE of previously-ingested
    * documents (doc_id % 3 != 0). Only genuinely novel content survives.
    * Both legs key on the uniform content digest — no skew by construction;
    * the store side prunes to a single hash column, so at 100 TB the
    * anti-join moves digests, not documents. */
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Dedup.incremental(
        batch = docs.filter(col("doc_id") % 3 === 0),
        store = docs.filter(col("doc_id") % 3 =!= 0),
        textCol = "text", idCol = "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q_zorder — Z-order clustering evidence on events (value × time): bin
    * both dimensions to 10 bits against corpus min/max (one-row broadcast
    * stats), interleave to a 20-bit Morton value, and report per z-"file"
    * (top 6 bits = 64 files) the row count and each dimension's bin span.
    * Every file covers exactly one 128×128 box of the (value, time) plane —
    * THE property that lets parquet min/max stats prune 2-D box predicates
    * at rest, which a single-column sort cannot give (it leaves the second
    * dimension at full span per file). All arithmetic is bit-exact across
    * engines: identical IEEE binning expression, integer interleave. The
    * write path itself (`Layout.writeZOrdered`) is exercised in LayoutSpec. */
  def qZorder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("value"),
        unix_micros(col("ts")).cast("double").as("tsu"))
    val st = ev.agg(min("value").as("vmin"), max("value").as("vmax"),
      min("tsu").as("tmin"), max("tsu").as("tmax"))
    ev.crossJoin(broadcast(st))
      .withColumn("vbin", Layout.rangeBin(col("value"), col("vmin"),
        col("vmax"), 1024))
      .withColumn("tbin", Layout.rangeBin(col("tsu"), col("tmin"),
        col("tmax"), 1024))
      .withColumn("z", Layout.zorderValue(col("vbin"), col("tbin"), 10))
      .withColumn("zfile", shiftright(col("z"), 14))
      .groupBy("zfile")
      .agg(count(lit(1)).as("n"),
        min("vbin").as("vbin_min"), max("vbin").as("vbin_max"),
        min("tbin").as("tbin_min"), max("tbin").as("tbin_max"))
      .orderBy("zfile")
  }

  /** q_hilbert — Hilbert-curve clustering evidence on events (value ×
    * time), the locality upgrade of q_zorder: same 10-bit binning against
    * one-row broadcast stats, but the file index comes from the Hilbert
    * d value (consecutive d are always grid NEIGHBOURS — Morton jumps at
    * power-of-two seams), so per-file 2-D spans are tighter at the tail
    * and parquet min/max stats prune box predicates better. Bit-exact
    * cross-engine: identical IEEE binning, and the state-dependent level
    * loop is mirrored level-for-level in the oracle's unrolled CTE chain
    * ([[graft.operators.Layout.hilbertOracleCtes]]). */
  def qHilbert(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("value"),
        unix_micros(col("ts")).cast("double").as("tsu"))
    val st = ev.agg(min("value").as("vmin"), max("value").as("vmax"),
      min("tsu").as("tmin"), max("tsu").as("tmax"))
    ev.crossJoin(broadcast(st))
      .withColumn("vbin", Layout.rangeBin(col("value"), col("vmin"),
        col("vmax"), 1024))
      .withColumn("tbin", Layout.rangeBin(col("tsu"), col("tmin"),
        col("tmax"), 1024))
      .withColumn("hd", Layout.hilbertValue(col("vbin"), col("tbin"), 10))
      .withColumn("hfile", shiftright(col("hd"), 14))
      .groupBy("hfile")
      .agg(count(lit(1)).as("n"),
        min("vbin").as("vbin_min"), max("vbin").as("vbin_max"),
        min("tbin").as("tbin_min"), max("tbin").as("tbin_max"))
      .orderBy("hfile")
  }

  /** q_chunk_overlap — RAG-style strided chunking: 128-token windows every
    * 32 tokens per document, last window clipped to the document end, docs
    * shorter than one window yield exactly one chunk. Pure per-row
    * sequence+explode — ZERO shuffle; the complement of q_pack_chunks
    * (which concatenates across documents instead of windowing within
    * them). */
  def qChunkOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.chunkOverlap(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("n_tokens")),
        "doc_id", "n_tokens", size = 128, stride = 32)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("end_tok"), col("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")

  /** q_normalize — canonical text form for content-keyed operators: NFC
    * (custom codegen expression — Spark has no unicode normalizer) →
    * lowercase → trim → single-space whitespace runs, surfaced as the
    * normalized digest plus before/after lengths. This is the projection
    * that runs BEFORE exact dedup / incremental-store digests / hash
    * sampling so encoding and spacing provenance cannot split identical
    * content across digest keys. Zero shuffle; the unicode mechanics
    * (composed == decomposed) are fixture-tested in PipelineOpsSpec. */
  def qNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(col("text")).as("len_raw"),
        length(T.normalizeText(col("text"))).as("len_norm"),
        md5(T.normalizeText(col("text"))).as("norm_md5"))
      .orderBy("doc_id")
  }

  /** q_source_overlap — cross-source contamination matrix: near-dup pairs
    * (the guarded word-3-gram Jaccard edge set) aggregated to unordered
    * (source, source) counts — the data-governance view of where duplicate
    * content flows between corpus sources. One tiny aggregate over the
    * pair list; the expensive part is the same guarded candidate join the
    * dedup family already bounds. */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "text",
      "doc_id", n = 3, threshold = 0.05, maxShingleDfFraction = Some(0.01))
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("a_id"), col("source").as("src_a")),
        "a_id")
      .join(src.select(col("doc_id").as("b_id"), col("source").as("src_b")),
        "b_id")
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_lo", "source_hi")
  }

  /** q_doc_index — inverted-index build for a query vocabulary: per term,
    * document frequency and the full postings list (doc_id + 0-based token
    * positions) as canonical JSON. The at-rest structure BM25 queries
    * against; positions enable phrase/proximity search. Plan shape mirrors
    * q_bm25: the token explode filters to the (tiny, literal) vocabulary
    * BEFORE any shuffle, so postings traffic is proportional to term
    * occurrences, not corpus tokens; per-term postings lists are bounded by
    * document frequency. Both sides sort postings and positions, so the
    * JSON is deterministic. */
  def qDocIndex(s: SparkSession, dir: String): DataFrame =
    Ranking.postings(Tables.documents(s, dir), "doc_id", "text",
        vocab = Seq("spark", "table", "hash", "stream", "data"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        sum(size(col("positions"))).cast("long").as("n_occurrences"),
        to_json(sort_array(collect_list(
          struct(col("doc_id"), col("positions"))))).as("postings"))
      .orderBy("tok")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_index" -> (qDocIndex _),
    "q_normalize" -> (qNormalize _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_chunk_overlap" -> (qChunkOverlap _),
    "q_unigram_lm" -> (qUnigramLm _),
    "q_tfidf_terms" -> (qTfidfTerms _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_zorder" -> (qZorder _),
    "q_hilbert" -> (qHilbert _))

  override val oracle: Map[String, String] = Map(
    "q_doc_index" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ')[i] AS tok,
        |    CAST(i - 1 AS INT) AS pos
        |  FROM documents,
        |    UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS r(i)
        |  WHERE string_split(text, ' ')[i] IN
        |    ('spark', 'table', 'hash', 'stream', 'data')),
        |per_doc AS (
        |  SELECT tok, doc_id, list_sort(list(pos)) AS positions
        |  FROM toks GROUP BY tok, doc_id)
        |SELECT tok, COUNT(*) AS df,
        |  CAST(SUM(len(positions)) AS BIGINT) AS n_occurrences,
        |  to_json(list_sort(list({'doc_id': doc_id,
        |    'positions': positions}))) AS postings
        |FROM per_doc GROUP BY tok ORDER BY tok""".stripMargin,
    "q_normalize" ->
      """SELECT doc_id, length(text) AS len_raw,
        |  length(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '\s+', ' ', 'g'))) AS len_norm,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '\s+', ' ', 'g'))) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_source_overlap" ->
      """WITH sh0 AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |        i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS g
        |    FROM documents)),
        |sh AS (
        |  SELECT doc_id, g FROM sh0
        |  QUALIFY COUNT(*) OVER (PARTITION BY g) <=
        |    least(greatest(5, CAST(ceil((SELECT COUNT(*) FROM documents) * 0.01) AS BIGINT)), 10000)),
        |cnt AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM inter
        |  JOIN cnt ca ON a_id = ca.doc_id
        |  JOIN cnt cb ON b_id = cb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.05)
        |SELECT least(da.source, db.source) AS source_lo,
        |  greatest(da.source, db.source) AS source_hi,
        |  COUNT(*) AS n_pairs
        |FROM pairs
        |JOIN documents da ON a_id = da.doc_id
        |JOIN documents db ON b_id = db.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_chunk_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (
        |  SELECT doc_id, n, unnest(range(0,
        |    CAST(ceil(greatest(n - 128, 0) / 32.0) AS BIGINT) + 1)) AS i
        |  FROM d)
        |SELECT doc_id, i AS chunk_idx, i * 32 AS start_tok,
        |  least(i * 32 + 128, n) AS end_tok,
        |  least(i * 32 + 128, n) - i * 32 AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_unigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT SUM(cnt) AS total FROM cnt),
        |vocab AS (SELECT tok, cnt FROM cnt ORDER BY cnt DESC, tok LIMIT 1000),
        |nll AS (
        |  SELECT doc_id,
        |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov,
        |    CAST(round(-ln(CAST(coalesce(v.cnt, 1) AS DOUBLE) / total)
        |      * 1000000.0, 0) AS BIGINT) AS nll_u
        |  FROM toks t LEFT JOIN vocab v USING (tok) CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(nll_u) AS BIGINT) AS nll_micro,
        |  CAST(SUM(nll_u) // COUNT(*) AS BIGINT) AS ce_micro
        |FROM nll GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_tfidf_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, tf,
        |    COUNT(*) OVER (PARTITION BY tok) AS df,
        |    CAST(round(tf * ln(CAST(n_docs AS DOUBLE) /
        |      (COUNT(*) OVER (PARTITION BY tok))) * 1000000.0, 0) AS BIGINT)
        |      AS score_u
        |  FROM tf CROSS JOIN n),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score_u DESC, tok) AS rk
        |  FROM scored)
        |SELECT doc_id, tok, tf, df, score_u, rk
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "q_dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id, source, n_chars, sha256(text) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |keep AS (
        |  SELECT doc_id, source, n_chars, h FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id)
        |      AS rn
        |    FROM batch) WHERE rn = 1),
        |store AS (
        |  SELECT DISTINCT sha256(text) AS h
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT doc_id, source, n_chars FROM keep
        |WHERE h NOT IN (SELECT h FROM store)
        |ORDER BY doc_id""".stripMargin,
    "q_zorder" ->
      """WITH ev AS (
        |  SELECT event_id, value, CAST(epoch_us(ts) AS DOUBLE) AS tsu
        |  FROM events),
        |st AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax,
        |  MIN(tsu) AS tmin, MAX(tsu) AS tmax FROM ev),
        |b AS (
        |  SELECT event_id,
        |    CASE WHEN vmax > vmin THEN CAST(least(greatest(
        |      floor((value - vmin) / (vmax - vmin) * 1024.0), 0), 1023)
        |      AS BIGINT) ELSE 0 END AS vbin,
        |    CASE WHEN tmax > tmin THEN CAST(least(greatest(
        |      floor((tsu - tmin) / (tmax - tmin) * 1024.0), 0), 1023)
        |      AS BIGINT) ELSE 0 END AS tbin
        |  FROM ev CROSS JOIN st),
        |z AS (
        |  SELECT *, CAST(list_sum(list_transform(range(0, 10),
        |    i -> (((vbin >> i) & 1) << (2 * i + 1)) +
        |         (((tbin >> i) & 1) << (2 * i)))) AS BIGINT) AS z
        |  FROM b)
        |SELECT z >> 14 AS zfile, COUNT(*) AS n,
        |  MIN(vbin) AS vbin_min, MAX(vbin) AS vbin_max,
        |  MIN(tbin) AS tbin_min, MAX(tbin) AS tbin_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    // Hilbert: same binning head as q_zorder; the level loop is the
    // shared unrolled CTE chain so the engine fold and the oracle cannot
    // drift. l10's d is the final curve index.
    "q_hilbert" ->
      s"""WITH ev AS (
        |  SELECT event_id, value, CAST(epoch_us(ts) AS DOUBLE) AS tsu
        |  FROM events),
        |st AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax,
        |  MIN(tsu) AS tmin, MAX(tsu) AS tmax FROM ev),
        |b AS (
        |  SELECT event_id,
        |    CASE WHEN vmax > vmin THEN CAST(least(greatest(
        |      floor((value - vmin) / (vmax - vmin) * 1024.0), 0), 1023)
        |      AS BIGINT) ELSE 0 END AS vbin,
        |    CASE WHEN tmax > tmin THEN CAST(least(greatest(
        |      floor((tsu - tmin) / (tmax - tmin) * 1024.0), 0), 1023)
        |      AS BIGINT) ELSE 0 END AS tbin
        |  FROM ev CROSS JOIN st),
        |l0 AS (SELECT event_id, vbin AS x, tbin AS y,
        |  CAST(0 AS BIGINT) AS d, CAST(512 AS BIGINT) AS s FROM b),
        |${Layout.hilbertOracleCtes("event_id", 10)},
        |hb AS (SELECT b.event_id, b.vbin, b.tbin, l10.d AS hd
        |  FROM b JOIN l10 USING (event_id))
        |SELECT hd >> 14 AS hfile, COUNT(*) AS n,
        |  MIN(vbin) AS vbin_min, MAX(vbin) AS vbin_max,
        |  MIN(tbin) AS tbin_min, MAX(tbin) AS tbin_max
        |FROM hb GROUP BY 1 ORDER BY 1""".stripMargin)
}
