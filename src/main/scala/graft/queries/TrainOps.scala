package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{Dedup, Dsir, Outliers}

/** Round-5 training-data operators: the web-corpus preparation steps that
  * sit around the dedup/quality core — HTML boilerplate stripping, URL
  * parsing, deterministic corpus shuffling and train/val/test splitting,
  * per-label embedding centroids, rolling-window anomaly detection, and the
  * fully ORACLE-CHECKED banded-MinHash near-dup (md5 hash family — unlike
  * q_dedup_near's engine-local xxhash64 banding, every byte of this
  * signature is reproducible in DuckDB, so LSH candidate generation AND
  * verification are hash-matched end-to-end, recall included).
  *
  * Oracle discipline matches LlmOps/CorpusOps: md5/sha2 only, doubles
  * rounded before any threshold/rank decision, window sums quantized to
  * integer units where the two engines would otherwise associate float
  * additions differently.
  */
object TrainOps extends QueryFamily {

  /** q_dedup_near_md5 — banded-MinHash near-dup pairs with a FULL DuckDB
    * oracle: 4 bands × 2 md5 minhashes over word-3-gram shingles, band-key
    * equi-join candidates, exact Jaccard verify at dist ≤ 0.5. The one LSH
    * operator where even the probabilistic recall is cross-engine-checked,
    * because the hash family is algorithm-defined. */
  def qDedupNearMd5(s: SparkSession, dir: String): DataFrame =
    Dedup.nearMinhashMd5(Tables.documents(s, dir), "text", "doc_id",
        maxDistance = 0.5)
      .orderBy("a_id", "b_id")

  /** q_minhash_est — MinHash estimator audit over the banded candidate
    * pairs: 16-hash Jaccard estimate vs exact shingle Jaccard with the
    * absolute error, estimator hashes disjoint from the banding hashes
    * (selection-bias-free). The measurement the whole near-dedup
    * threshold family rests on. See
    * [[graft.operators.Dedup.minhashEstimatorAudit]]. */
  def qMinhashEst(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashEstimatorAudit(Tables.documents(s, dir), "text", "doc_id")

  /** q_dedup_recall — the MinHash band gate's recall CURVE, measured
    * in-engine: exact-Jaccard truth pairs vs q_dedup_near_md5's verified
    * output, counted per distance decile — banded-LSH recall falls with
    * distance by construction, and the per-bucket view shows exactly
    * where the (4 bands × 2 rows) layout starts missing. The dedup twin
    * of q_ann_recall; counts + floor division ⇒ full-oracle. */
  def qDedupRecall(s: SparkSession, dir: String): DataFrame =
    // Tables.parallel MEASURED AND REJECTED here (optimization r15):
    // 7-pair A/B median 0.97x (0.85–1.14) — neutral; the recall curve is
    // dominated by the truth-pair join, not the signature scan.
    Dedup.minhashRecall(Tables.documents(s, dir), "text", "doc_id",
        maxDistance = 0.5)
      .orderBy("bucket")

  /** q_emb_centroid — per-label embedding centroid (the class prototype:
    * nearest-centroid classification, cluster drift monitoring, and the
    * k-means update step all read this shape). Element sums run over
    * MICRO-UNIT LONGS (`floor(x·10⁶)`) so the per-(label, dim) aggregation
    * is order-independent — float sums would differ between engines and
    * between partitionings. One explode + one narrow two-key aggregate:
    * 64·rows intermediate, map-side partials, no skew (labels are
    * near-uniform). */
  def qEmbCentroid(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xq", floor(col("x").cast("double") * 1e6).cast("long"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("xq").as("sq"))
      // no round(): sq and n are exact integers, so this single double
      // division is bit-identical in any engine — while round()'s half-up
      // vs half-even tie-break DOES diverge on boundary quotients
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        (col("sq").cast("double") / (col("n") * 1e6)).as("centroid"))
      .orderBy("label", "dim")

  /** q_emb_sq8_err — SQ8 quantization reconstruction-error audit, per
    * dimension: for the q_sim_sq8 8-bit scalar quantizer (per-dim min/max
    * range, 255 levels) the dimension's value range plus the max and mean
    * absolute reconstruction error in micro units — the measurement that
    * justifies (or vetoes) serving from SQ8 codes before any recall is
    * spent, the quantization twin of q_ann_recall. Theory says max err ≤
    * range/510 (half a level); this measures it, and a dimension whose
    * error rides the bound while its range dwarfs the others is the one
    * to keep in float.
    *
    * Engine-exact: the dequantized value is the q_sim_sq8 formula in the
    * SAME operation order on both engines; each |x − dq| rounds to 6 dp
    * then micro-quantizes to int64 BEFORE aggregation (the mmrTopK
    * discipline), so sums/max/divisions are pure integers. Scale shape:
    * two narrow passes over the exploded components (per-dim min/max —
    * d-row map-side partials — then a broadcast-stats error pass into a
    * d-row aggregate); no window, no corpus shuffle. */
  def qEmbSq8Err(s: SparkSession, dir: String): DataFrame = {
    val flat = Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("i").cast("long").as("i"),
        col("xf").cast("double").as("x"))
    val st = flat.groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
    flat.join(broadcast(st), "i")
      .withColumn("dq", when(col("mx") > col("mn"),
        col("mn") + round((col("x") - col("mn")) * lit(255.0) /
          (col("mx") - col("mn"))) * (col("mx") - col("mn")) / lit(255.0))
        .otherwise(col("mn")))
      .withColumn("e_micro",
        expr("CAST(round(round(abs(x - dq), 6) * 1000000) AS BIGINT)"))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(round(max(mx) - min(mn), 6) * 1000000) AS BIGINT)")
          .as("range_micro"),
        max("e_micro").as("max_err_micro"),
        sum("e_micro").as("sum_err_micro"))
      .withColumn("mean_err_micro", expr("sum_err_micro div n"))
      .select("i", "n", "range_micro", "max_err_micro", "mean_err_micro")
      .orderBy("i")
  }

  /** q_emb_dimcorr — embedding dimension-redundancy audit: the 20 most
    * correlated dimension PAIRS (Pearson over the corpus, micro-quantized
    * components) — highly correlated dimensions mean the representation
    * wastes capacity and PQ/SQ codebooks will alias; the diagnostic that
    * decides whether a random-projection (q_emb_rp) or PCA step should
    * precede quantization. Complements q_emb_isotropy (global dispersion)
    * with a per-dimension-pair view. Scale shape: JOIN-FREE — every
    * (i, j, qᵢ, qⱼ) pair term comes straight off the embedding array in
    * ONE projection (a d(d−1)/2-struct explode per row; an earlier form
    * self-joined the exploded component table on vec_id, which shuffled
    * ~d× corpus rows just to reunite components that already sat in the
    * same array), and the single aggregate lands on d(d−1)/2 cells with
    * map-side combine — the shuffle carries ~2k rows per partition
    * regardless of corpus size, and the corpus itself never shuffles.
    * All six moments ride the same cells (the per-dim sums are
    * recomputed per pair — a few kB of duplicate aggregate state buys
    * zero joins). Moments are exact DECIMAL(38,0) of floor-quantized
    * micros (the q_emb_centroid discipline — floor, not round, to avoid
    * tie-break divergence); the final corr is the q_corr float recipe
    * mirrored verbatim. */
  def qEmbDimcorr(s: SparkSession, dir: String): DataFrame = {
    // the per-row pair expansion stays in LONG micros end-to-end (|q| ≤
    // ~1e6·max|x|, so q·q ≤ ~1e12 ≪ 2⁶³ per term — boxed decimal math
    // inside the d(d−1)/2-struct lambda measured 4× slower); only the
    // corpus-wide SUMS widen to DECIMAL(38,0), where Σq² crosses int64
    val qv0 = Tables.embeddings(s, dir)
      .select(transform(col("embedding"), x =>
        floor(x.cast("double") * 1e6).cast("long")).as("q"))
    // toy-scale adapter (the cosinePairsExact adaptive-grid precedent):
    // the zero-shuffle plan's parallelism comes from the SCAN's input
    // splits — abundant at corpus scale, where this branch is a no-op
    // and the corpus never shuffles — but a sub-megabyte rehearsal file
    // arrives as ONE split and would serialize the whole d(d−1)/2
    // expansion behind one core; fan out only when the scan cannot (the
    // shuffled payload is the tiny file itself). Output is exact
    // integer sums either way — partitioning cannot move a bit.
    val qv =
      if (qv0.rdd.getNumPartitions >= 16) qv0 else qv0.repartition(32)
    // two chained GENERATORS, not higher-order lambdas: posexplode and
    // slice are codegen'd, while a transform(...) lambda evaluates
    // interpreted per element — measured 3× slower across the d(d−1)/2
    // expansion. Row i pairs with the tail slice q[i+2..], so j = i+1+dj
    // and i = d−1 (empty tail) drops out via the empty-array explode.
    val terms = qv
      .select(col("q"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"),
        posexplode(slice(col("q"), col("i") + lit(2),
          greatest(size(col("q")) - col("i") - 1, lit(0))))
          .as(Seq("dj", "qj")))
      .select(col("i").cast("long").as("i"),
        (col("i") + 1 + col("dj")).cast("long").as("j"),
        col("qi"), col("qj"))
    // ALL corpus-wide sums widen to DECIMAL(38,0) at the aggregate (the
    // house rule: long in the per-row hot path, decimal only at the
    // aggregate boundary). An earlier form kept sx/sy as plain long sums
    // on a 1e10-row headroom argument — but non-ANSI long sums WRAP
    // silently past int64 (no null, no error: the divergent-failure mode
    // the q_assortativity i64 guard exists to prevent), and unnormalized
    // large-magnitude embeddings eat that headroom fast.
    val sp = terms.groupBy("i", "j").agg(
      count(lit(1)).as("n"),
      sum(col("qi").cast("decimal(38,0)")).as("sx"),
      sum(col("qj").cast("decimal(38,0)")).as("sy"),
      sum((col("qi") * col("qi")).cast("decimal(38,0)")).as("sxx"),
      sum((col("qj") * col("qj")).cast("decimal(38,0)")).as("syy"),
      sum((col("qi") * col("qj")).cast("decimal(38,0)")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val cov = d("n") * d("sxy") - d("sx") * d("sy")
    val vx = d("n") * d("sxx") - d("sx") * d("sx")
    val vy = d("n") * d("syy") - d("sy") * d("sy")
    sp.select(col("i"), col("j"),
        when(vx > 0 && vy > 0, round(cov / (sqrt(vx) * sqrt(vy)), 6))
          .otherwise(lit(null).cast("double")).as("corr"))
      .withColumn("abs_corr", abs(col("corr")))
      .select("i", "j", "abs_corr", "corr")
      .orderBy(desc("abs_corr"), asc("i"), asc("j"))
      .limit(20)
  }

  /** q_emb_isotropy — per-label embedding dispersion report via the
    * CENTROID TRICK: mean pairwise dot = (‖Σv‖² − Σ‖v‖²) / (n(n−1)),
    * computed from ONE pass of per-dimension sums — O(N·d), never the
    * O(N²) pair join the naive formulation needs (at 100 TB the pair
    * join is impossible; this is exact and linear). High coherence
    * permille = the label is a tight cluster; near-zero = the label
    * carries no geometric signal (the anisotropy/hubness diagnostic of
    * Ethayarajh 2019 applied per class). All arithmetic on micro-
    * quantized integers in DECIMAL(38,0) (Σxq reaches 3·10¹⁵ at 10¹⁰
    * rows; its square overflows int64), with sign-explicit truncating
    * divisions so Spark's `div` and DuckDB's flooring `//` agree on
    * negative numerators. */
  def qEmbIsotropy(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.embIsotropy(
        Tables.embeddings(s, dir), "label", "embedding")
      .orderBy("label")

  /** q_shuffle_det — deterministic global corpus shuffle: every document
    * gets a content-independent pseudo-random key (md5 over a seed + its
    * id), a shard in [0, 8) from the key's first nibble, and a dense
    * position within its shard by key order. The reproducible "shuffle the
    * corpus before training" step — identical across runs, engines, and
    * partitionings, unlike `orderBy(rand())`. One window per shard; at
    * 100 TB the same plan repartitions by shard and sorts within — no
    * global order ever materializes. */
  def qShuffleDet(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("skey",
        md5(concat(lit("shuf42:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 1), 16, 10).cast("long") % 8)
          .as("shard"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy("skey", "doc_id"))
        .cast("long"))
      .select("doc_id", "shard", "pos", "skey")
      .orderBy("doc_id")

  /** q_split_hash — reproducible train/val/test split by content hash
    * (~5% val, ~5% test by md5-prefix bands) with the per-(source, split)
    * audit counts a dataset card reports. Like q_sample_hash the assignment
    * is a pure content function — a document keeps its split across corpus
    * growth, re-partitioning, and engines; no RNG, no state. */
  def qSplitHash(s: SparkSession, dir: String): DataFrame = {
    val h2 = substring(md5(col("text")), 1, 2)
    Tables.documents(s, dir)
      .withColumn("split",
        when(h2 <= "0c", "val").when(h2 <= "19", "test").otherwise("train"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source", "split")
  }

  /** q_html_strip — HTML boilerplate removal: each document is wrapped in a
    * deterministic page template (title/style/heading/script + entities) and
    * stripped back to text — script/style blocks dropped, tags → word
    * boundaries, entities decoded, whitespace collapsed. The corpus carries
    * no real HTML, so the round-trip is the verifiable contract: the graded
    * artifact is the stripper, exercised on crafted markup in TrainOpsSpec.
    * Zero shuffle — one codegen'd regex chain. */
  def qHtmlStrip(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("html", concat(
        lit("<html><head><title>"), col("source"),
        lit("</title><style>p {color: red}</style></head><body><h1>"),
        col("source"), lit(" &amp; docs</h1><p>"), col("text"),
        lit("</p><script>var x = 1 &lt; 2;</script></body></html>")))
      .withColumn("clean", T.stripHtml(col("html")))
      .select(col("doc_id"),
        length(col("html")).cast("long").as("n_raw"),
        length(col("clean")).cast("long").as("n_clean"),
        md5(col("clean")).as("clean_md5"),
        substring(col("clean"), 1, 40).as("head"))
      .orderBy("doc_id")

  /** q_url_parse — URL structure extraction (host/path/query-param/
    * fragment/registered domain) over deterministic per-document URLs — the
    * provenance-analysis step of a web corpus (domain mixes, per-host
    * quality priors). Spark's `parse_url` against DuckDB regex mirrors;
    * zero shuffle. */
  def qUrlParse(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("url", concat(
        lit("https://www."), col("source"), lit(".example.com/docs/"),
        col("lang"), lit("/"), col("doc_id").cast("string"),
        lit("?lang="), col("lang"), lit("&ref=search#s1")))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .select(col("doc_id"), col("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
        expr("parse_url(url, 'REF')").as("frag"),
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1).as("domain"))
      .orderBy("doc_id")

  /** q_rolling_z — rolling-window anomaly detection on the event stream:
    * each value scored against the mean/σ of its user's trailing 20 events,
    * |z| > 3 flagged. The per-series "is this point abnormal vs its own
    * recent history" monitor (the global twin is q_outliers' median/MAD).
    * Integer milli-unit window sums keep the statistics engine-exact — see
    * Outliers.rollingZ. */
  def qRollingZ(s: SparkSession, dir: String): DataFrame =
    Outliers.rollingZ(
        Tables.events(s, dir).select("event_id", "user_id", "ts", "value"),
        "user_id", Seq("ts", "event_id"), "value", frame = 20, zMax = 3.0)
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("mean"), 6).as("mean"), col("z"))
      .orderBy("event_id")

  /** q_substr_dedup — exact-substring duplication statistics: every 8-token
    * rolling window is hashed; windows whose hash occurs ≥ 2 times anywhere
    * in the corpus are the spans a substring-dedup pass would strip, and
    * consecutive duplicated windows merge into maximal spans. The distributed
    * analog of suffix-array substring dedup — see Dedup.substrDupStats for
    * the shuffle shape. */
  def qSubstrDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.substrDupStats(Tables.documents(s, dir), "text", "doc_id", k = 8)
      .orderBy("doc_id")

  /** q_mixture_plan — temperature-based source-mixture planning (the data-
    * mixing step before training: raw web-scale source shares are too
    * skewed, so per-source sampling weights are flattened with q_s ∝
    * p_s^(1/T), T = 2). Per source: doc/token counts, raw token share p,
    * temperature share q, and the sampling factor q·(B/tokens) under a
    * B = total/2 token budget — factor > 1 means the source is upsampled
    * (multiple epochs), < 1 downsampled.
    *
    * Determinism: token counts integer-sum exactly; p is a single division
    * of exact longs; √p is IEEE-exact; the CROSS-SOURCE sum of √p values is
    * quantized to micro-unit longs first (float addition order would
    * otherwise differ between engines). The final factor formula is kept
    * textually identical on both sides. Source count is tiny (domains, not
    * documents), so the one-row totals broadcast is free. */
  def qMixturePlan(s: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(T.tokenCount(col("text"))).as("tokens"))
    val total = perSrc.agg(sum("tokens").as("total_tokens"))
    val withP = perSrc.join(broadcast(total))
      .withColumn("p", col("tokens").cast("double") / col("total_tokens"))
      .withColumn("sqq", floor(sqrt(col("p")) * 1e6).cast("long"))
    val sumQ = withP.agg(sum("sqq").as("sum_sqq"))
    withP.join(broadcast(sumQ))
      .withColumn("q", col("sqq").cast("double") / col("sum_sqq"))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round(col("q") * col("total_tokens") * 0.5 / col("tokens"), 6)
          .as("factor"))
      .orderBy("source")
  }

  /** q_quality_gate — per-source relative quality gating: drop the bottom
    * decile of each source's quality-score distribution (a fixed global
    * threshold would empty low-register sources and pass everything from
    * high-register ones — production filters gate RELATIVE to the source).
    * The cut uses percent_rank over a (score, doc_id) total order: an exact
    * rational (rank−1)/(n−1) of integers, so the boundary is bit-identical
    * in any engine — no interpolated-percentile last-ulp risk.
    *
    * Scale shape (the [[graft.operators.Ranks]] two-phase discipline — a
    * whole source never rides one percent_rank task): pr ≥ 0.1 is monotone
    * in rank (IEEE division by a positive constant), so the kept set is a
    * rank SUFFIX — n_kept = n − rc + 1 and min_kept_score is the order
    * statistic at the cut rank rc. rc is found by evaluating the SAME
    * double predicate (rank−1)/(n−1) ≥ 0.1 on the ±2 integer neighborhood
    * of the rational boundary ⌈(n−1)/10⌉ + 1 (a double's relative error
    * 2⁻⁵³ cannot move the comparison by more than one rank step while the
    * rank gap is 1/(n−1) ≥ 2⁻⁵², i.e. for any n below 2⁵²) — so no
    * per-row pr is ever computed. The corpus is touched by one
    * score-band aggregate and one broadcast-pruned pick window over the
    * single straddling bucket per source. n = 1 sources keep nothing:
    * percent_rank of a lone row is 0 < 0.1 in both engines. */
  def qQualityGate(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        T.qualityScore(col("text")).as("score"))
      .localCheckpoint(eager = false) // feeds offsets + the pick window
    val bucket = floor(col("score") * 4096).cast("long")
    val offs = graft.operators.Ranks.bucketOffsets(scored, Seq("source"),
      bucket)
    val totals = graft.operators.Ranks.totals(offs, Seq("source"))
    val cut = totals.filter(col("n") > 1)
      .withColumn("r0", expr("(n - 1 + 9) div 10 + 1"))
      .withColumn("r",
        explode(sequence(greatest(lit(1L), col("r0") - 2),
          least(col("n"), col("r0") + 2))))
      .filter((col("r") - 1).cast("double") / (col("n") - 1).cast("double")
        >= 0.1)
      .groupBy("source").agg(min("r").as("pos"))
    val picked = graft.operators.Ranks.orderStatAt(scored, Seq("source"),
      bucket, Seq(col("score"), col("doc_id")), "score", offs, cut, "pos",
      "cut_score")
    totals.join(broadcast(picked.select("source", "pos", "cut_score")),
        Seq("source"), "left")
      .select(col("source"), col("n").as("n_total"),
        coalesce(col("n") - col("pos") + 1, lit(0L)).as("n_kept"),
        round(col("cut_score"), 6).as("min_kept_score"))
      .orderBy("source")
  }

  /** q_dsir — DSIR-style importance resampling (hashed-bigram log-ratio
    * scoring against a target subset + deterministic top-K selection).
    * English documents stand in as the "trusted target domain"; the score
    * measures how en-like each document's hashed bigram profile is. Every
    * stage — md5 bucketing, Laplace-smoothed distributions, micro-nat
    * quantization, ≥-threshold selection — is recomputed by the oracle. */
  def qDsir(s: SparkSession, dir: String): DataFrame =
    Dsir.select(Tables.documents(s, dir), "text", "doc_id",
        targetPred = col("lang") === "en", nBuckets = 64, topK = 100)
      .orderBy("doc_id")

  /** q_length_buckets — length-bucketed batching analysis: documents bin
    * into power-of-two token-length buckets (the standard dataloader
    * bucketing that minimizes attention-mask padding), and each bucket
    * reports its padding economics — tokens, the bucket's true max
    * length, and the waste a batch padded to that max would carry. Pure
    * integer arithmetic end to end (shifts, sums), so the whole report is
    * oracle-exact; one bucket-keyed aggregate with map-side partials and
    * bucket cardinality ~log(max_len). */
  def qLengthBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(T.tokenCount(col("text")).as("n_tok"))
      .filter(col("n_tok") > 0)
      // bucket upper bound = next power of two ≥ n_tok (min 16), via EXACT
      // bit arithmetic — length(bin(n-1)) is the bit length, so
      // 1 << bitlen(n-1) is the smallest 2^k ≥ n; a float ceil(log2(n))
      // can land on either side of an exact power cross-engine
      .withColumn("bucket_hi",
        greatest(lit(16L),
          expr("shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1)))")))
      .groupBy("bucket_hi")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        max(col("n_tok")).as("max_tokens"),
        (max(col("n_tok")) * count(lit(1)) - sum(col("n_tok")))
          .as("waste_at_max"),
        (col("bucket_hi") * count(lit(1)) - sum(col("n_tok")))
          .as("waste_at_cap"))
      .orderBy("bucket_hi")

  /** q_sample_fps — farthest-point (k-center greedy) coreset sampling over
    * the embedding corpus: 8 coverage-maximizing representatives with
    * their max-min squared micro-unit distances. Engine-exact integer
    * greedy ⇒ full-oracle via unrolled rounds
    * (`Similarity.fpsOracleSql`). */
  def qSampleFps(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.farthestPointSample(
        Tables.embeddings(s, dir).select("vec_id", "embedding"), k = 8)
      .orderBy("rnk")

  /** q_mix_apply — EXECUTE the temperature mixture plan as a
    * deterministic hash sample: each source keeps documents whose
    * content-independent md5(doc_id) permille falls under the source's
    * keep rate, the rate being q_mixture_plan's T=2 sampling factor under
    * the B = total/2 token budget (capped at 1000‰ — this is the
    * downsampling executor; upsampled sources keep everything and epoch
    * multiplicity is the loader's job). The rate is EXACT integer
    * arithmetic end to end: factor·1000 = (sqq·total·500)/(sum_sqq·tokens)
    * as a DECIMAL(38,0) integral divide — no float ever decides a keep,
    * so the materialized mix is bit-stable across runs, engines, and
    * partitionings. Shape: two tiny aggregates broadcast onto one corpus
    * scan — no corpus shuffle at all. */
  def qMixApply(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val perSrc = docs.groupBy("source")
      .agg(sum(T.tokenCount(col("text"))).as("tokens"))
    val total = perSrc.agg(sum("tokens").as("total_tokens"))
    val withP = perSrc.join(broadcast(total))
      .withColumn("p", col("tokens").cast("double") / col("total_tokens"))
      .withColumn("sqq", floor(sqrt(col("p")) * 1e6).cast("long"))
    val sumQ = withP.agg(sum("sqq").as("sum_sqq"))
    val rates = withP.join(broadcast(sumQ))
      .select(col("source"),
        least(lit(1000L), expr(
          "(CAST(sqq AS DECIMAL(38,0)) * total_tokens * 500) div " +
            "(CAST(sum_sqq AS DECIMAL(38,0)) * tokens)"))
          .as("keep_permille"))
    // 12 hex digits (48 bits) before the mod: 2^48 mod 1000 = 656, so the
    // residue bias is ≤ 1/2^48 relative — 3 digits (2^12) would oversample
    // small keep rates by up to ~22% (residues 0-95 occur 5/4096 vs 4/4096).
    docs.join(broadcast(rates), "source")
      .withColumn("h",
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("|mix"))), 1, 12), 16, 10).cast("long") % 1000)
      .filter(col("h") < col("keep_permille"))
      .select(col("doc_id"), col("source"), col("keep_permille"))
      .orderBy("doc_id")
  }

  /** q_pareto_docs — per-source 2-D Pareto frontier over documents:
    * maximize distinct-token diversity while minimizing character cost —
    * the multi-objective data-selection primitive (which docs are
    * efficient per byte WITHOUT committing to one quality scalarization;
    * a mixture planner selects from the frontier). Dominance strict on at
    * least one axis; double ties are mutually undominated and kept. See
    * [[graft.operators.Skyline.paretoFrontier]] — the sort-based skyline
    * with the two-phase bucket discipline, no global-order window. */
  def qParetoDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skyline.paretoFrontier(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          col("n_chars"),
          size(array_distinct(T.tokens(col("text")))).cast("long")
            .as("distinct_toks")),
        "source", "doc_id", "n_chars", "distinct_toks")
      .select(col("g").as("source"), col("id").as("doc_id"),
        col("c").as("n_chars"), col("u").as("distinct_tokens"))
      .orderBy("source", "doc_id")

  /** q_span_mask — deterministic span-corruption plan (the T5 §3.1.4 /
    * UL2 denoising-objective preprocessing step): for every document,
    * ~15% of characters selected as fixed-length spans whose positions
    * are a PURE FUNCTION of (doc_id, span_idx, tag) — so the mask plan
    * replays identically across reruns and engines (no RNG-state
    * coordination problem), and the oracle re-derives every offset. The
    * doc is partitioned into k = max(1, 15n/1200) equal windows with one
    * 12-char span placed per window at an md5-derived offset — spans are
    * DISJOINT BY CONSTRUCTION (window width n/k ≥ 80 ≥ 12 whenever
    * k > 1), which hash-then-reject schemes only get probabilistically.
    * The 48-bit hash before the mod is the q_mix_apply residue-bias
    * discipline. Everything rides the scan: one sequence-explode (k
    * rows per doc, bounded by n/80) and codegen'd string/hash ops — no
    * shuffle before the dump sort. */
  def qSpanMask(s: SparkSession, dir: String): DataFrame = {
    val L = 12
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      .filter(col("n") >= L)
      .withColumn("k", greatest(lit(1L), expr(s"(n * 15) div (100 * $L)")))
      .withColumn("w", expr("n div k"))
      .select(col("doc_id"), col("text"), col("w"),
        explode(expr("sequence(CAST(0 AS BIGINT), k - 1)")).as("span_idx"))
      .withColumn("hv",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("|"),
          col("span_idx").cast("string"), lit("|spanmask"))), 1, 12),
          16, 10).cast("long"))
      .withColumn("start", expr(s"span_idx * w + 1 + hv % (w - $L + 1)"))
      .withColumn("masked_span",
        expr(s"substring(text, CAST(start AS INT), $L)"))
      .select("doc_id", "span_idx", "start", "masked_span")
      .orderBy("doc_id", "span_idx")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_span_mask" -> (qSpanMask _),
    "q_pareto_docs" -> (qParetoDocs _),
    "q_mix_apply" -> (qMixApply _),
    "q_sample_fps" -> (qSampleFps _),
    "q_length_buckets" -> (qLengthBuckets _),
    "q_dsir" -> (qDsir _),
    "q_dedup_near_md5" -> (qDedupNearMd5 _),
    "q_minhash_est" -> (qMinhashEst _),
    "q_dedup_recall" -> (qDedupRecall _),
    "q_emb_centroid" -> (qEmbCentroid _),
    "q_emb_sq8_err" -> (qEmbSq8Err _),
    "q_emb_dimcorr" -> (qEmbDimcorr _),
    "q_emb_isotropy" -> (qEmbIsotropy _),
    "q_shuffle_det" -> (qShuffleDet _),
    "q_split_hash" -> (qSplitHash _),
    "q_html_strip" -> (qHtmlStrip _),
    "q_url_parse" -> (qUrlParse _),
    "q_rolling_z" -> (qRollingZ _),
    "q_substr_dedup" -> (qSubstrDedup _),
    "q_mixture_plan" -> (qMixturePlan _),
    "q_quality_gate" -> (qQualityGate _))

  override val oracle: Map[String, String] = Map(
    // Span mask: every offset re-derived — same window partition, same
    // 48-bit md5 arithmetic (the q_mix_apply hex-fold idiom).
    "q_span_mask" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE length(text) >= 12),
        |k AS (
        |  SELECT doc_id, text, n,
        |    GREATEST(1, (n * 15) // (100 * 12)) AS k,
        |    n // GREATEST(1, (n * 15) // (100 * 12)) AS w
        |  FROM d),
        |sp AS (
        |  SELECT doc_id, text, w,
        |    CAST(unnest(range(0, k)) AS BIGINT) AS span_idx
        |  FROM k),
        |h AS (
        |  SELECT doc_id, text, span_idx, w,
        |    CAST(list_sum(list_transform(range(1, 13), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
        |          CAST(span_idx AS VARCHAR) || '|spanmask'),
        |          CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        << (4 * (12 - CAST(i AS INTEGER))))) AS BIGINT) AS hv
        |  FROM sp)
        |SELECT doc_id, span_idx,
        |  span_idx * w + 1 + hv % (w - 12 + 1) AS start,
        |  substr(text,
        |    CAST(span_idx * w + 1 + hv % (w - 12 + 1) AS INTEGER), 12)
        |    AS masked_span
        |FROM h ORDER BY doc_id, span_idx""".stripMargin,
    // Skyline: the oracle is the definitional NOT EXISTS dominance
    // anti-join (exact at oracle scale; the engine's bucketed two-phase
    // plan must reproduce it row-for-row).
    "q_pareto_docs" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS c,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS u
        |  FROM documents)
        |SELECT source, doc_id, c AS n_chars, u AS distinct_tokens
        |FROM d a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM d b WHERE b.source = a.source
        |    AND b.c <= a.c AND b.u >= a.u AND (b.c < a.c OR b.u > a.u))
        |ORDER BY source, doc_id""".stripMargin,
    // The keep rate is a pure-integer divide (sqq·total·500)//(sum_sqq·
    // tokens) and the keep decision 12 md5 hex digits (48 bits) mod 1000
    // (bias ≤ 1/2^48) — nothing float anywhere near a row decision.
    "q_mix_apply" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM per),
        |wp AS (
        |  SELECT source, tokens, total_tokens,
        |    CAST(floor(sqrt(CAST(tokens AS DOUBLE) / total_tokens) * 1000000)
        |      AS BIGINT) AS sqq
        |  FROM per, tot),
        |sq AS (SELECT CAST(SUM(sqq) AS BIGINT) AS sum_sqq FROM wp),
        |rates AS (
        |  SELECT source,
        |    LEAST(1000, CAST((CAST(sqq AS HUGEINT) * total_tokens * 500) //
        |      (CAST(sum_sqq AS HUGEINT) * tokens) AS BIGINT))
        |      AS keep_permille
        |  FROM wp, sq)
        |SELECT d.doc_id, d.source, r.keep_permille
        |FROM documents d JOIN rates r USING (source)
        |WHERE CAST(list_sum(list_transform(range(1, 13), i ->
        |    CAST(strpos('0123456789abcdef',
        |      substr(md5(CAST(d.doc_id AS VARCHAR) || '|mix'),
        |        CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |      << (4 * (12 - CAST(i AS INTEGER))))) AS BIGINT)
        |  % 1000 < r.keep_permille
        |ORDER BY doc_id""".stripMargin,
    "q_sample_fps" -> graft.operators.Similarity.fpsOracleSql(8),
    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT len(string_split(text, ' ')) AS n_tok FROM documents
        |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0),
        |b AS (SELECT n_tok,
        |        GREATEST(16, 1 << length(bin(n_tok - 1))) AS bucket_hi
        |      FROM t)
        |SELECT CAST(bucket_hi AS BIGINT) AS bucket_hi,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(MAX(n_tok) AS BIGINT) AS max_tokens,
        |  CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS waste_at_max,
        |  CAST(bucket_hi * COUNT(*) - SUM(n_tok) AS BIGINT) AS waste_at_cap
        |FROM b GROUP BY bucket_hi ORDER BY bucket_hi""".stripMargin,
    "q_dsir" -> Dsir.oracleSql(targetPredSql = "lang = 'en'",
      nBuckets = 64, topK = 100),
    "q_dedup_near_md5" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS gs
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |mh AS (
        |  SELECT doc_id, gs, [
        |    list_aggregate(list_transform(gs, g -> md5('0|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('1|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('2|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('3|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('4|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('5|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('6|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('7|' || g)), 'min')
        |  ] AS keys
        |  FROM docs),
        |bands AS (
        |  SELECT doc_id, unnest(range(0, 4)) AS band, unnest(keys) AS key
        |  FROM mh),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id,
        |  round(1.0 - CAST(len(list_intersect(da.gs, db.gs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(da.gs, db.gs))), 6) AS dist
        |FROM cand
        |JOIN docs da ON a_id = da.doc_id
        |JOIN docs db ON b_id = db.doc_id
        |WHERE round(1.0 - CAST(len(list_intersect(da.gs, db.gs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(da.gs, db.gs))), 6) <= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // MinHash estimator audit: q_dedup_near_md5's candidate chain, then
    // per pair the 16-hash estimate (hashes 8..23 — disjoint from the
    // banding hashes 0..7) vs exact Jaccard, all integer permilles.
    "q_minhash_est" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS gs
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |mh AS (
        |  SELECT doc_id, gs, [
        |    list_aggregate(list_transform(gs, g -> md5('0|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('1|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('2|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('3|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('4|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('5|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('6|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('7|' || g)), 'min')
        |  ] AS keys
        |  FROM docs),
        |bands AS (
        |  SELECT doc_id, unnest(range(0, 4)) AS band, unnest(keys) AS key
        |  FROM mh),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |sig AS (
        |  SELECT doc_id, gs,
        |    list_transform(range(8, 24), h ->
        |      list_aggregate(list_transform(gs,
        |        g -> md5(CAST(h AS VARCHAR) || '|' || g)), 'min')) AS sg
        |  FROM docs),
        |paired AS (
        |  SELECT a_id, b_id,
        |    len(list_filter(range(1, 17), i -> sa.sg[i] = sb.sg[i]))
        |      AS n_match,
        |    len(list_intersect(sa.gs, sb.gs)) AS n_inter,
        |    len(list_distinct(list_concat(sa.gs, sb.gs))) AS n_union
        |  FROM cand
        |  JOIN sig sa ON a_id = sa.doc_id
        |  JOIN sig sb ON b_id = sb.doc_id)
        |SELECT a_id, b_id, CAST(n_match AS BIGINT) AS n_match,
        |  CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(n_union AS BIGINT) AS n_union,
        |  CAST((n_match * 1000) // 16 AS BIGINT) AS est_permille,
        |  CAST((n_inter * 1000) // n_union AS BIGINT) AS jaccard_permille,
        |  CAST(abs((n_match * 1000) // 16 - (n_inter * 1000) // n_union)
        |    AS BIGINT) AS err_permille
        |FROM paired ORDER BY a_id, b_id""".stripMargin,
    // MinHash recall curve: the q_dedup_near_md5 candidate chain (found)
    // against an exact shingle-equi-join truth set, counted per distance
    // decile (round(dist·1e6) // 1e5) — integer counts, floor division.
    "q_dedup_recall" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS gs
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(gs) AS g FROM docs),
        |cnt AS (SELECT doc_id, len(gs) AS c FROM docs),
        |tp AS (
        |  SELECT a_id, b_id,
        |    round(1.0 - CAST(i AS DOUBLE) / (ca.c + cb.c - i), 6) AS dist
        |  FROM (
        |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
        |    FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2)
        |  JOIN cnt ca ON a_id = ca.doc_id
        |  JOIN cnt cb ON b_id = cb.doc_id),
        |tr AS (
        |  SELECT CAST(round(dist * 1000000) AS BIGINT) // 100000 AS bucket,
        |    COUNT(*) AS n_true
        |  FROM tp WHERE dist <= 0.5 GROUP BY 1),
        |mh AS (
        |  SELECT doc_id, gs, [
        |    list_aggregate(list_transform(gs, g -> md5('0|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('1|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('2|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('3|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('4|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('5|' || g)), 'min'),
        |    list_aggregate(list_transform(gs, g -> md5('6|' || g)), 'min') || '|' ||
        |      list_aggregate(list_transform(gs, g -> md5('7|' || g)), 'min')
        |  ] AS keys
        |  FROM docs),
        |bands AS (
        |  SELECT doc_id, unnest(range(0, 4)) AS band, unnest(keys) AS key
        |  FROM mh),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |fnd AS (
        |  SELECT a_id, b_id,
        |    round(1.0 - CAST(len(list_intersect(da.gs, db.gs)) AS DOUBLE) /
        |      len(list_distinct(list_concat(da.gs, db.gs))), 6) AS dist
        |  FROM cand
        |  JOIN docs da ON a_id = da.doc_id
        |  JOIN docs db ON b_id = db.doc_id),
        |fr AS (
        |  SELECT CAST(round(dist * 1000000) AS BIGINT) // 100000 AS bucket,
        |    COUNT(*) AS n_found
        |  FROM fnd WHERE dist <= 0.5 GROUP BY 1)
        |SELECT t.bucket,
        |  CAST(t.n_true AS BIGINT) AS n_true,
        |  CAST(COALESCE(f.n_found, 0) AS BIGINT) AS n_found,
        |  CAST(COALESCE(f.n_found, 0) * 1000 // t.n_true AS BIGINT)
        |    AS recall_permille
        |FROM tr t LEFT JOIN fr f USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_emb_centroid" ->
      """WITH flat AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings)
        |SELECT label, dim, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
        |      AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid
        |FROM flat GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    // SQ8 error audit: the dequantize formula is q_sim_sq8's in the same
    // operation order; |x − dq| rounds to 6 dp then micro-quantizes to
    // int64 before any aggregate, so the whole report is integer.
    "q_emb_sq8_err" ->
      """WITH flat AS (
        |  SELECT unnest(range(0, len(embedding))) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |st AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM flat GROUP BY i),
        |e AS (
        |  SELECT i, mn, mx,
        |    CAST(round(round(abs(x - (CASE WHEN mx > mn
        |      THEN mn + round((x - mn) * 255.0 / (mx - mn)) * (mx - mn) / 255.0
        |      ELSE mn END)), 6) * 1000000) AS BIGINT) AS e_micro
        |  FROM flat JOIN st USING (i))
        |SELECT i, COUNT(*) AS n,
        |  CAST(round(round(MAX(mx) - MIN(mn), 6) * 1000000) AS BIGINT)
        |    AS range_micro,
        |  MAX(e_micro) AS max_err_micro,
        |  CAST(SUM(e_micro) // COUNT(*) AS BIGINT) AS mean_err_micro
        |FROM e GROUP BY i ORDER BY i""".stripMargin,
    // Dim-corr: same floor-micro quantization, HUGEINT moments, q_corr's
    // float recipe (double casts of exact ints, sqrt, one divide, round 6).
    "q_emb_dimcorr" ->
      """WITH comp AS (
        |  SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
        |      AS HUGEINT) AS q
        |  FROM embeddings),
        |m1 AS (
        |  SELECT dim, COUNT(*) AS n, SUM(q) AS sx, SUM(q * q) AS sxx
        |  FROM comp GROUP BY dim),
        |sp AS (
        |  SELECT a.dim AS i, b.dim AS j, SUM(a.q * b.q) AS sxy
        |  FROM comp a JOIN comp b
        |    ON a.vec_id = b.vec_id AND a.dim < b.dim
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT i, j,
        |    CASE WHEN
        |      CAST(mi.n AS DOUBLE) * CAST(mi.sxx AS DOUBLE) -
        |        CAST(mi.sx AS DOUBLE) * CAST(mi.sx AS DOUBLE) > 0
        |      AND CAST(mi.n AS DOUBLE) * CAST(mj.sxx AS DOUBLE) -
        |        CAST(mj.sx AS DOUBLE) * CAST(mj.sx AS DOUBLE) > 0
        |    THEN round(
        |      (CAST(mi.n AS DOUBLE) * CAST(sp.sxy AS DOUBLE) -
        |        CAST(mi.sx AS DOUBLE) * CAST(mj.sx AS DOUBLE)) /
        |      (sqrt(CAST(mi.n AS DOUBLE) * CAST(mi.sxx AS DOUBLE) -
        |          CAST(mi.sx AS DOUBLE) * CAST(mi.sx AS DOUBLE)) *
        |       sqrt(CAST(mi.n AS DOUBLE) * CAST(mj.sxx AS DOUBLE) -
        |          CAST(mj.sx AS DOUBLE) * CAST(mj.sx AS DOUBLE))), 6)
        |    END AS corr
        |  FROM sp JOIN m1 mi ON mi.dim = sp.i JOIN m1 mj ON mj.dim = sp.j)
        |SELECT i, j, abs(corr) AS abs_corr, corr FROM r
        |ORDER BY abs_corr DESC, i, j LIMIT 20""".stripMargin,
    // Isotropy: HUGEINT mirrors of the engine's DECIMAL(38,0) moments;
    // sign-explicit truncating divisions (Spark div truncates toward
    // zero, DuckDB // floors — they agree only on non-negatives).
    "q_emb_isotropy" ->
      """WITH flat AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings),
        |q AS (
        |  SELECT label, dim,
        |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq
        |  FROM flat),
        |pd AS (
        |  SELECT label, dim, COUNT(*) AS n, SUM(xq) AS sd,
        |    SUM(CAST(xq AS HUGEINT) * xq) AS sqq
        |  FROM q GROUP BY 1, 2),
        |agg AS (
        |  SELECT label, MAX(n) AS n,
        |    SUM(CAST(sd AS HUGEINT) * sd) AS ss, SUM(sqq) AS t
        |  FROM pd GROUP BY label),
        |stats AS (
        |  SELECT label, CAST(n AS BIGINT) AS n,
        |    CAST(t // n AS BIGINT) AS mean_sq_norm_pico,
        |    CASE WHEN n > 1 THEN
        |      CAST(CASE WHEN ss - t >= 0
        |        THEN (ss - t) // (CAST(n AS HUGEINT) * (n - 1))
        |        ELSE -((t - ss) // (CAST(n AS HUGEINT) * (n - 1))) END
        |        AS BIGINT)
        |    ELSE NULL END AS mean_pair_dot_pico
        |  FROM agg)
        |SELECT label, n, mean_sq_norm_pico, mean_pair_dot_pico,
        |  CASE WHEN mean_pair_dot_pico IS NOT NULL AND mean_sq_norm_pico > 0
        |    THEN CASE WHEN mean_pair_dot_pico >= 0
        |      THEN (1000 * mean_pair_dot_pico) // mean_sq_norm_pico
        |      ELSE -((1000 * -mean_pair_dot_pico) // mean_sq_norm_pico) END
        |  ELSE NULL END AS coherence_permille
        |FROM stats ORDER BY label""".stripMargin,
    "q_shuffle_det" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, skey,
        |    CAST((strpos('0123456789abcdef', substring(skey, 1, 1)) - 1) % 8
        |      AS BIGINT) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS pos,
        |  skey
        |FROM sh ORDER BY doc_id""".stripMargin,
    "q_split_hash" ->
      """SELECT source,
        |  CASE WHEN substring(md5(text), 1, 2) <= '0c' THEN 'val'
        |       WHEN substring(md5(text), 1, 2) <= '19' THEN 'test'
        |       ELSE 'train' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    "q_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>' || source ||
        |    '</title><style>p {color: red}</style></head><body><h1>' ||
        |    source || ' &amp; docs</h1><p>' || text ||
        |    '</p><script>var x = 1 &lt; 2;</script></body></html>' AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |          regexp_replace(html,
        |          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |          '&lt;', '<', 'g'),
        |          '&gt;', '>', 'g'),
        |          '&quot;', '"', 'g'),
        |          '&#39;', '''', 'g'),
        |          '&nbsp;', ' ', 'g'),
        |          '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, length(html) AS n_raw, length(clean) AS n_clean,
        |  md5(clean) AS clean_md5, substring(clean, 1, 40) AS head
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.com/docs/' || lang || '/' ||
        |      CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&ref=search#s1'
        |      AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
        |    regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
        |    regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang,
        |    regexp_extract(url, '#(.*)$', 1) AS frag
        |  FROM u)
        |SELECT doc_id, host, path, q_lang, frag,
        |  regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_substr_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |wins AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    md5(array_to_string(ws[i:i+7], ' ')) AS h
        |  FROM t, unnest(range(1, len(ws) - 6)) AS u(i)
        |  WHERE len(ws) >= 8),
        |dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
        |marked AS (
        |  SELECT doc_id, pos FROM wins WHERE h IN (SELECT h FROM dup)),
        |isl AS (
        |  SELECT doc_id,
        |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM marked),
        |spans AS (
        |  SELECT doc_id, grp, COUNT(*) AS run FROM isl GROUP BY doc_id, grp),
        |per_span AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |    CAST(MAX(run) + 7 AS BIGINT) AS max_span_tokens
        |  FROM spans GROUP BY doc_id),
        |nw AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
        |  FROM wins GROUP BY doc_id),
        |nd AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
        |  FROM marked GROUP BY doc_id)
        |SELECT nw.doc_id, n_windows,
        |  COALESCE(n_dup, 0) AS n_dup_windows,
        |  round(CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_windows, 6)
        |    AS dup_ratio,
        |  COALESCE(n_spans, 0) AS n_spans,
        |  COALESCE(max_span_tokens, 0) AS max_span_tokens
        |FROM nw LEFT JOIN nd USING (doc_id) LEFT JOIN per_span USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_mixture_plan" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM per),
        |wp AS (
        |  SELECT source, n_docs, tokens, total_tokens,
        |    CAST(tokens AS DOUBLE) / total_tokens AS p,
        |    CAST(floor(sqrt(CAST(tokens AS DOUBLE) / total_tokens) * 1000000)
        |      AS BIGINT) AS sqq
        |  FROM per, tot),
        |sq AS (SELECT CAST(SUM(sqq) AS BIGINT) AS sum_sqq FROM wp)
        |SELECT source, n_docs, tokens, round(p, 6) AS p,
        |  round(CAST(sqq AS DOUBLE) / sum_sqq, 6) AS q,
        |  round(CAST(sqq AS DOUBLE) / sum_sqq * total_tokens * 0.5 / tokens, 6)
        |    AS factor
        |FROM wp, sq ORDER BY source""".stripMargin,
    "q_quality_gate" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    0.4 * (CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE) / len(string_split(text, ' ')))
        |      + 0.4 * (1 - (1 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))))
        |      + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) / 8.0, 1.0) AS score
        |  FROM documents),
        |pr AS (
        |  SELECT source, score,
        |    percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id)
        |      AS pr
        |  FROM scored)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(SUM(CASE WHEN pr >= 0.1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  round(MIN(CASE WHEN pr >= 0.1 THEN score END), 6) AS min_kept_score
        |FROM pr GROUP BY source ORDER BY source""".stripMargin,
    "q_rolling_z" ->
      """WITH b AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CAST(floor(value * 1000) AS BIGINT) AS vq
        |  FROM events),
        |w1 AS (
        |  SELECT event_id, user_id, value,
        |    ROW_NUMBER() OVER w AS rn,
        |    SUM(vq) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |      AS sum_q,
        |    SUM(vq * vq) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |      AS sumsq_q
        |  FROM b
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |z AS (
        |  SELECT event_id, user_id, value,
        |    CAST(sum_q AS DOUBLE) / 20000.0 AS mean,
        |    CAST(sumsq_q AS DOUBLE) / 20000000.0 -
        |      (CAST(sum_q AS DOUBLE) / 20000.0) *
        |      (CAST(sum_q AS DOUBLE) / 20000.0) AS var
        |  FROM w1 WHERE rn >= 20)
        |SELECT event_id, user_id, value, round(mean, 6) AS mean,
        |  round((value - mean) / sqrt(var), 4) AS z
        |FROM z
        |WHERE var > 0 AND abs(round((value - mean) / sqrt(var), 4)) > 3.0
        |ORDER BY event_id""".stripMargin)
}
