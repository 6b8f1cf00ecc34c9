package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN quality checks: the approximate paths must agree with the exact
  * brute-force top-k on recall, not just run. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
  private lazy val corpus = emb.select("vec_id", "embedding")

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("IVF top-k recall beats the probe fraction on random embeddings") {
    // The fixture embeddings are uniform random — the worst case for IVF
    // (no cluster structure, neighbours spread evenly over cells), where
    // expected recall ≈ the probe fraction (4/16 = 25%). Clustered real
    // corpora recall far higher; the full-probe test below pins exactness.
    val exact = topkSet(Similarity.cosineTopK(queries, corpus, 10))
    val ivf = topkSet(Similarity.ivfTopK(queries, corpus, 10,
      nCells = 16, nProbe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall exact=${exact.size} ivf=${ivf.size}")
    // every IVF hit must carry the same rounded sim as the exact ranking
    assert(ivf.subsetOf(topkSet(Similarity.cosineTopK(queries, corpus, 500))))
  }

  test("SQ8 quantized top-k stays close to exact (8-bit error is tiny)") {
    // 8-bit scalar quantization perturbs each dim by ≤ range/510, so
    // rounded cosines move by ~1e-3 — the top-10 should overlap the exact
    // top-10 almost entirely (ties at the boundary may swap)
    val exact = topkSet(Similarity.cosineTopK(queries, corpus, 10))
    val sq8 = topkSet(Similarity.sq8TopK(queries, corpus, 10))
    val recall = (exact intersect sq8).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
    // and a full-depth quantized ranking must contain every exact top-10 id
    assert(exact.subsetOf(topkSet(Similarity.sq8TopK(queries, corpus, 100))))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("a_id").cast("long"), col("b_id").cast("long"), col("sim"))
      .as[(Long, Long, Double)].collect().toSet

  private def exactPairSet(minSim: Double): Set[(Long, Long, Double)] = {
    import graft.functions.VectorFunctions
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    pairSet(broadcast(a).crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim",
        round(VectorFunctions.cosine(col("a_emb"), col("b_emb")), 6))
      .filter(col("sim") >= minSim)
      .select("a_id", "b_id", "sim"))
  }

  test("blocked-exact cosine pairs equal the reference crossJoin (every tile, both orders)") {
    // nBlocks chosen so blocks are tiny relative to the corpus: exercises
    // same-block dedup AND cross-block canonicalization (a_id > b_id pairs
    // landing in a (bi < bj) tile must still come out once, least-first)
    for (minSim <- Seq(0.45, 0.40); nBlocks <- Seq(1, 7)) {
      val exact = exactPairSet(minSim)
      val blocked = pairSet(Similarity.cosinePairsExact(corpus, minSim, nBlocks))
      assert(exact.nonEmpty, s"vacuous parity fixture at minSim=$minSim")
      assert(blocked === exact,
        s"minSim=$minSim nBlocks=$nBlocks diff=${exact diff blocked}")
    }
  }

  test("LSH-gated cosine pairs equal the exact all-pairs join (100% recall)") {
    for (minSim <- Seq(0.45, 0.40)) {
      val exact = exactPairSet(minSim)
      val gated = pairSet(Similarity.cosinePairsGated(corpus, minSim))
      assert(exact.nonEmpty, s"vacuous parity fixture at minSim=$minSim")
      assert(gated === exact, s"minSim=$minSim missed=${exact diff gated}")
    }
  }

  test("cosinePairs dispatches by threshold regime") {
    // below the gate regime the plan must contain no LSH transform (a
    // deterministic kernel join only); the result still matches exact
    val low = Similarity.cosinePairs(corpus, 0.45)
    assert(pairSet(low) === exactPairSet(0.45))
    // the gated path is reachable and returns a subset of the exact set
    // with zero false positives by construction (verify step)
    val hi = pairSet(Similarity.cosinePairs(corpus, 0.9))
    assert(hi.subsetOf(exactPairSet(0.9)))
  }

  test("cosinePairsExact is tile-grid invariant (adaptive default included)") {
    // the block grid is a memory/shuffle knob, never semantics: a pinned
    // tiny grid, a pinned odd grid, and the adaptive default (which sizes
    // from a corpus count) must return identical pair sets
    val adaptive = pairSet(Similarity.cosinePairsExact(corpus, 0.45))
    assert(adaptive === pairSet(Similarity.cosinePairsExact(corpus, 0.45,
      nBlocks = 1)))
    assert(adaptive === pairSet(Similarity.cosinePairsExact(corpus, 0.45,
      nBlocks = 7)))
    assert(adaptive === exactPairSet(0.45))
  }

  test("IVF at-rest layout: probe prunes to the probed cells; full probe is exact") {
    val dir = graft.operators.Scratch.dir("ivf_layout")
    val centroids = Similarity.writeIvfLayout(corpus, dir, nCells = 8)
    val probe = Similarity.probeIvfLayout(dir, queries, centroids,
      k = 10, nProbe = 2)
    val p = probe.queryExecution.executedPlan.toString
    // the probe join must reach the scan as a partition-pruning filter on
    // cell_id (dynamic partition pruning), not a full-layout read
    assert(p.contains("PartitionFilters"), p.take(3000))
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(3000))
    assert(probe.count() === 30) // 3 queries × top-10 from probed cells
    // probing every cell == reading the whole layout == exact brute force
    val full = topkSet(Similarity.probeIvfLayout(dir, queries, centroids,
      k = 10, nProbe = 8))
    assert(full === topkSet(Similarity.cosineTopK(queries, corpus, 10)))
  }

  test("PQ at-rest layout: stored codes serve identical answers; scan reads codes only") {
    val dir = graft.operators.Scratch.dir("pq_layout")
    Similarity.writePqLayout(corpus, dir)
    val stored = Similarity.probePqLayout(dir, queries, corpus, k = 10)
    // fit, encode, and ADC are deterministic end-to-end, so serving from
    // the stored codes must be ROW-IDENTICAL to a fresh fit+encode run
    val fresh = Similarity.pqTopK(queries, corpus, 10)
    assert(stored.collect().map(_.toString).sorted.toSeq ===
      fresh.collect().map(_.toString).sorted.toSeq)
    // the ADC phase scans the stored codes table only — its parquet read
    // schema must be (vec_id, codes), no embedding column (the 16x
    // at-rest IO win is the point of the layout)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("struct<vec_id:bigint,codes:array<int>>"), plan.take(4000))
    val codesScanLines = plan.linesIterator
      .filter(_.contains("pq_layout")).filter(_.contains("/codes"))
    assert(codesScanLines.forall(!_.contains("embedding")))
  }

  test("IVF-PQ with full probing and corpus-wide shortlist equals exact") {
    // nProbe = nCells removes the IVF approximation; a shortlist wider
    // than the corpus removes the ADC approximation (every candidate is
    // exact-reranked) — the composition must then equal brute force.
    val full = topkSet(Similarity.ivfPqTopK(queries, corpus, 10,
      nCells = 4, nProbe = 4, shortlistFactor = 1000))
    assert(full === topkSet(Similarity.cosineTopK(queries, corpus, 10)))
  }

  test("IVF-PQ registered config: candidates confined to probed cells") {
    // every returned hit must also appear in a deep exact ranking (the
    // rerank is exact, so sims are identical), and the hit count per
    // query never exceeds k
    val got = Similarity.ivfPqTopK(queries, corpus, 10)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 10))
    assert(topkSet(got).subsetOf(
      topkSet(Similarity.cosineTopK(queries, corpus, 2000))))
  }

  test("IVF-PQ at-rest layout: stored codes match fresh answers; probed cells prune the scan") {
    val dir = graft.operators.Scratch.dir("ivfpq_layout")
    Similarity.writeIvfPqLayout(corpus, dir)
    val stored = Similarity.probeIvfPqLayout(dir, queries, corpus, k = 10)
    val fresh = Similarity.ivfPqTopK(queries, corpus, 10)
    assert(stored.collect().map(_.toString).sorted.toSeq ===
      fresh.collect().map(_.toString).sorted.toSeq)
    val p = stored.queryExecution.executedPlan.toString
    // the static probed-cell isin must reach the cell-partitioned scan as
    // a PartitionFilter (plan-time pruning — only probed directories read)
    assert(p.contains("PartitionFilters: [cell_id"), p.take(4000))
    // and the codes scan carries no embedding column
    assert(p.linesIterator.filter(_.contains("ivfpq_layout"))
      .filter(_.contains("/codes")).forall(!_.contains("embedding")), p.take(4000))
  }

  test("IVF-PQ append: stored-quantizer ingest serves the union exactly under full probe") {
    val dir = graft.operators.Scratch.dir("ivfpq_append")
    val half1 = corpus.filter(col("vec_id") % 2 === 0)
    val half2 = corpus.filter(col("vec_id") % 2 =!= 0)
    Similarity.writeIvfPqLayout(half1, dir, nCells = 4)
    Similarity.appendIvfPqLayout(half2, dir)
    // appended vectors are findable; with every cell probed and a
    // corpus-wide shortlist the exact rerank makes the answer EQUAL to
    // brute force over the union, regardless of codebook quality (the
    // codebooks were fit on half1 only — that affects recall at tight
    // shortlists, never correctness at full width)
    val got = topkSet(Similarity.probeIvfPqLayout(dir, queries, corpus,
      k = 10, nProbe = 4, shortlistFactor = 1000))
    assert(got === topkSet(Similarity.cosineTopK(queries, corpus, 10)))
  }

  test("radProject: exact on a hand-computed fixture; JL preserves distance order") {
    import graft.expressions.RadSigns
    // exactness: one vector, hand-fold the signed micro-sum per dim
    val v = Array.tabulate(8)(i => (0.25f * (i - 3)))
    val out = Similarity.radProject(
        Seq((1L, v)).toDF("vec_id", "embedding"), "embedding", kOut = 4)
      .select("proj").head().getSeq[Long](0)
    val expected = (0 until 4).map { t =>
      (0 until 8).map(i =>
        math.round(v(i).toDouble * 1e6) * RadSigns.sign(t, i).toLong).sum
    }
    assert(out.toSeq === expected)
    // distance-order preservation (the JL point): over random pairs the
    // projected distances must correlate strongly with the originals
    val rnd = new scala.util.Random(7)
    val vecs = Array.fill(60)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val proj = Similarity.radProject(
        vecs.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toSeq
          .toDF("vec_id", "embedding"), "embedding", kOut = 16)
      .orderBy("vec_id").select("proj").collect()
      .map(_.getSeq[Long](0).toArray)
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def p2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    // Rademacher signs give E[‖proj z‖²] = kOut·‖z‖² (micro-units²), and
    // each ratio behaves like χ²_k/k — so the RIGHT JL assertion is a
    // bounded per-pair distortion ratio plus a mean near 1, NOT distance
    // correlation (random Gaussian pairs concentrate, so correlation is
    // weak even under perfect JL behavior).
    val ratios = for (a <- 0 until 30; b <- 30 until 60) yield
      p2(proj(a), proj(b)) / (16.0 * 1e12 * d2(vecs(a), vecs(b)))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean distortion ratio $mean")
    assert(ratios.min > 0.1 && ratios.max < 4.0,
      s"ratio range [${ratios.min}, ${ratios.max}]")
  }

  test("bitextMargin: a planted translation pair mines at top margin; one row per source") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = Array.fill(12)(vec())
    // source 5's "translation" is target 105: the same vector + tiny noise
    val planted = base(5).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val src = base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("s_id", "s_emb")
    val tgt = (Array.fill(11)(vec()) :+ planted).zipWithIndex
      .map { case (v, i) => (100L + i, v) }.toSeq.toDF("t_id", "t_emb")
    val out = Similarity.bitextMargin(src, tgt, k = 3)
      .select(col("s_id"), col("t_id"), col("margin_permille"))
      .as[(Long, Long, Long)].collect()
    // best-per-source: s_id unique; every kept margin clears the threshold
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.forall(_._3 >= 1000L))
    // the planted pair must be mined, and with the run's highest margin
    // (a near-identical pair towers over random neighbourhoods)
    val mined = out.find(_._1 == 5L)
    assert(mined.exists(_._2 == 111L), s"planted pair not mined: $mined")
    assert(mined.get._3 === out.map(_._3).max)
  }

  test("annRadiusRecall: counts agree with a hand brute force; zero-neighbour query scores 1000") {
    import graft.functions.VectorFunctions
    val got = Similarity.annRadiusRecall(queries, corpus, 1.3)
      .select(col("q_id"), col("n_true"), col("n_cand"), col("recall_permille"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // truth side: brute-forced radius counts
    val trueCounts = broadcast(queries).crossJoin(corpus)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("dist", sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) *
        VectorFunctions.cosine(col("q_emb"), col("embedding")))))
      .filter(col("dist") <= 1.3)
      .groupBy("q_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    got.foreach { case (q, (_, nTrue, nCand, permille)) =>
      assert(nTrue === trueCounts.getOrElse(q, 0L))
      assert(nCand <= nTrue, "candidates are distance-verified, so ⊆ truth")
      assert(permille === (if (nTrue == 0) 1000L else nCand * 1000 / nTrue))
    }
    // an orthogonal one-hot query vector far from every corpus vector has
    // no radius-0.2 neighbours → the vacuous-1000 row must still emit
    val lonely = Seq((99L, Array.fill(64)(0f).updated(0, 1f)))
      .toDF("q_id", "q_emb")
    val row = Similarity.annRadiusRecall(lonely, corpus, 0.2)
      .select("n_true", "n_cand", "recall_permille")
      .as[(Long, Long, Long)].head()
    assert(row === ((0L, 0L, 1000L)))
  }

  test("IVF with full probing equals exact brute force") {
    val exact = topkSet(Similarity.cosineTopK(queries, corpus, 10))
    val full = topkSet(Similarity.ivfTopK(queries, corpus, 10,
      nCells = 4, nProbe = 4))
    assert(full === exact)
  }

  test("q_sim_ann registered config: recall >= 0.9 vs exact euclidean set") {
    // Ground truth: every (query, vector) pair within euclidean 1.3,
    // brute-forced. The registered q_sim_ann config (bucketLength 1.5,
    // 8 hash tables, OR-amplified) must recover >= 90% of them; and since
    // annCandidates verifies candidates with the exact distance, it can
    // never emit a false positive — assert the subset relation too.
    val exact = broadcast(queries).crossJoin(corpus)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("dist", sqrt(aggregate(
        zip_with(col("q_emb"), col("embedding"),
          (x, y) => ((x - y) * (x - y)).cast("double")),
        lit(0.0), (acc, v) => acc + v)))
      .filter(col("dist") <= 1.3)
      .select(col("q_id").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    val ann = topkSet(Similarity.annCandidates(queries, corpus, 1.3))
    assert(exact.nonEmpty, "vacuous recall fixture")
    assert(ann.subsetOf(exact), s"false positives: ${ann diff exact}")
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=${exact.size} ann=${ann.size}")
  }

  test("q_sim_ivf registered config: recall >= 0.9 on clustered embeddings") {
    // The sf fixture is uniform random — IVF's adversarial case, where
    // recall ≈ probe fraction by construction (asserted above). Real
    // embedding corpora are clustered, which is the case IVF exists for:
    // on a seeded 8-cluster fixture the registered q_sim_ivf config
    // (nCells 16, nProbe 4) must put >= 90% of each query's exact top-10
    // into the probed cells.
    val rnd = new scala.util.Random(42)
    val d = 16
    val centers = Array.fill(8, d)(rnd.nextGaussian() * 4.0)
    val rows = for (c <- 0 until 8; j <- 0 until 100) yield
      ((c * 100 + j).toLong,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    val cl = rows.toDF("vec_id", "embedding")
    val qs = cl.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = topkSet(Similarity.cosineTopK(qs, cl, 10))
    val ivf = topkSet(Similarity.ivfTopK(qs, cl, 10, nCells = 16, nProbe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=${exact.size} ivf=${ivf.size}")
    // the composed IVF-PQ must hold the same gate on the clustered
    // fixture: residual codes inside probed cells + the exact rerank
    // recover >= 90% of the exact top-10 (d=16 → m=4 subspaces of 4)
    val ivfpq = topkSet(Similarity.ivfPqTopK(qs, cl, 10,
      nCells = 16, nProbe = 4))
    val pqRecall = (exact intersect ivfpq).size.toDouble / exact.size
    assert(pqRecall >= 0.9, s"ivfpq recall=$pqRecall")
  }

  test("PQ ADC distance equals the true distance to the quantized reconstruction") {
    import graft.expressions.{PqAdcDistances, PqEncode, PqExpressions}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // hand-built codebooks: 2 subspaces × 2 centroids × 2 dims
    val books = Array(
      Array(Array(0f, 0f), Array(1f, 1f)),
      Array(Array(2f, 2f), Array(-1f, 0f)))
    val v = new GenericArrayData(Array(0.9f, 1.1f, -0.8f, 0.1f))
    val codes = PqEncode(org.apache.spark.sql.catalyst.expressions.Literal
      .create(null, org.apache.spark.sql.types.NullType), books)
      .nullSafeEval(v).asInstanceOf[GenericArrayData]
    // subspace 0: (0.9,1.1) is nearer (1,1); subspace 1: (-0.8,0.1) nearer (-1,0)
    assert(codes.getInt(0) == 1 && codes.getInt(1) == 1)
    val q = Array(0.5, 0.5, 0.5, 0.5)
    val tables = Array(Array.tabulate(2, 2) { (j, c) =>
      val cent = books(j)(c)
      (0 until 2).map(i => math.pow(q(j * 2 + i) - cent(i), 2)).sum
    })
    val adc = PqAdcDistances(org.apache.spark.sql.catalyst.expressions.Literal
      .create(null, org.apache.spark.sql.types.NullType), tables)
      .nullSafeEval(codes).asInstanceOf[GenericArrayData]
    // ADC = exact distance from q to the RECONSTRUCTION (1,1,-1,0)
    val recon = Array(1.0, 1.0, -1.0, 0.0)
    val expect = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(adc.getDouble(0) - expect) < 1e-12)
    // Malformed input → null, never silent zeros or a task kill: a null
    // element must not quantize as 0.0f, and a null/out-of-range code must
    // not index centroid 0 or throw.
    val withNull = new GenericArrayData(
      Array[Any](0.9f, null, -0.8f, 0.1f))
    assert(PqEncode(org.apache.spark.sql.catalyst.expressions.Literal
      .create(null, org.apache.spark.sql.types.NullType), books)
      .nullSafeEval(withNull) == null)
    val adcExpr = PqAdcDistances(org.apache.spark.sql.catalyst.expressions
      .Literal.create(null, org.apache.spark.sql.types.NullType), tables)
    assert(adcExpr.nullSafeEval(
      new GenericArrayData(Array[Any](1, null))) == null)
    assert(adcExpr.nullSafeEval(
      new GenericArrayData(Array[Any](1, 7))) == null)
    assert(adcExpr.nullSafeEval(
      new GenericArrayData(Array[Any](-1, 0))) == null)
  }

  test("q_sim_pq registered config: recall >= 0.9 on clustered embeddings") {
    val rnd = new scala.util.Random(43)
    val d = 16
    val centers = Array.fill(8, d)(rnd.nextGaussian() * 4.0)
    val rows = for (c <- 0 until 8; j <- 0 until 100) yield
      ((c * 100 + j).toLong,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    val cl = rows.toDF("vec_id", "embedding")
    val qs = cl.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = topkSet(Similarity.cosineTopK(qs, cl, 10))
    val pq = topkSet(Similarity.pqTopK(qs, cl, 10))
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=${exact.size} pq=${pq.size}")
  }

  test("MMR: first pick is the top-1; diversified set spans both near modes") {
    // Two tight modes near the query, one slightly nearer: plain top-k
    // fills with the nearer mode's members; MMR's redundancy penalty must
    // cross over and cover both modes.
    val rnd = new scala.util.Random(7)
    val d = 8
    def around(center: Array[Double], n: Int, base: Long) =
      (0 until n).map(j => (base + j,
        center.map(x => (x + rnd.nextGaussian() * 0.01).toFloat)))
    // separation math: with weights 7/3 mode 2 wins round 2 iff
    // 7·(s1−s2) < 3·(within − cross); here s1−s2 ≈ 0.017 and
    // within−cross ≈ 0.165, so the penalty dominates with margin
    val m1 = Array(1.0, 0.3, 0, 0, 0, 0, 0, 0)
    val m2 = Array(1.0, -0.3, 0, 0, 0, 0, 0, 0)
    val q = Array(1.0, 0.03, 0, 0, 0, 0, 0, 0) // slightly nearer m1
    val corpus = (around(m1, 10, 100L) ++ around(m2, 10, 200L))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, q.map(_.toFloat))).toDF("q_id", "q_emb")
    val top = Similarity.cosineTopK(queries, corpus, 6)
      .select("vec_id").as[Long].collect()
    assert(top.forall(_ < 200L)) // plain top-k: all from the nearer mode
    val mmr = Similarity.mmrTopK(queries, corpus, 6, poolSize = 20)
      .orderBy("rnk").select("rnk", "vec_id").as[(Int, Long)].collect()
    // first pick IS the exact top-1 (no diversity penalty yet)
    assert(mmr.head._2 === top.head)
    // and the diversified set covers the second mode too
    assert(mmr.exists(_._2 >= 200L), mmr.mkString(","))
  }

  test("FPS covers every cluster: k=8 picks land one-per-mode") {
    val rnd = new scala.util.Random(11)
    val d = 16
    val centers = Array.fill(8, d)(rnd.nextGaussian() * 4.0)
    val rows = for (c <- 0 until 8; j <- 0 until 50) yield
      ((c * 50 + j).toLong,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    val picks = Similarity.farthestPointSample(corpus, 8)
      .select("vec_id").as[Long].collect()
    // max-min greedy on well-separated modes must take one from each
    assert(picks.map(_ / 50).toSet.size === 8, picks.mkString(","))
    // deterministic: identical trajectory on a re-run
    val again = Similarity.farthestPointSample(corpus, 8)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    assert(again.toSeq === Similarity.farthestPointSample(corpus, 8)
      .orderBy("rnk").select("vec_id").as[Long].collect().toSeq)
  }

  test("clusterSilhouette: separated blobs score all-positive, merged blobs go negative") {
    val rnd = new scala.util.Random(11)
    val d = 8
    def blob(center: Float, n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + i,
        Array.fill(d)(center + 0.01f * rnd.nextGaussian().toFloat)))
    // two far-apart tight blobs: with k=2 every member hugs its own
    // centroid => silhouette near +1000, zero negatives
    val sep = (blob(1.0f, 20, 0L) ++ blob(-1.0f, 20, 100L))
      .toDF("vec_id", "embedding")
    val good = Similarity.clusterSilhouette(sep, k = 2).collect()
    assert(good.length === 2)
    good.foreach { r =>
      assert(r.getLong(1) === 20L, s"blob split: $r")
      assert(r.getLong(2) > 900L, s"mean_sil_pm low: $r")
      assert(r.getLong(4) === 0L, s"negatives in separated blobs: $r")
    }
    // one blob over-split into k=4: members sit between the sub-centroids
    // => silhouette collapses toward (or below) zero for some members
    val one = blob(0.5f, 60, 0L).toDF("vec_id", "embedding")
    val bad = Similarity.clusterSilhouette(one, k = 4).collect()
    val worstMin = bad.map(_.getLong(3)).min
    assert(worstMin < 500L,
      s"over-split blob should not look cleanly separated: min=$worstMin")
    assert(bad.map(_.getLong(1)).sum === 60L) // every vector classified
  }

  test("semDedup: survivor set has no within-cell pair above threshold") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val out = Similarity.semDedup(emb, simThreshold = 0.45, nCells = 8)
      .cache()
    val n = out.count()
    assert(n === emb.count()) // every vector classified, kept or not
    val removedCnt = out.filter(!col("is_kept")).count()
    assert(removedCnt > 0, "vacuous fixture: nothing was semantically dup")
    // THE SemDeDup invariant: among survivors, no same-cell pair still
    // meets the threshold (any such pair would have voted one member out).
    val kept = out.filter(col("is_kept"))
      .join(emb, "vec_id").select("cell_id", "vec_id", "embedding")
    val bad = kept.select(col("cell_id"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"))
      .join(kept.select(col("cell_id"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), "cell_id")
      .filter(col("a_id") < col("b_id"))
      .filter(round(graft.functions.VectorFunctions.cosine(
        col("a_emb"), col("b_emb")), 6) >= 0.45)
      .count()
    assert(bad === 0L)
    out.unpersist()
  }

  test("semDedup: planted duplicate resolves to one survivor, deterministically") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val base = Array.fill(d)(rnd.nextGaussian().toFloat)
    val near = base.map(x => x * 0.995f + 0.005f)
    val rows = Seq((0L, base), (1L, near)) ++
      (2L until 40L).map(i => (i, Array.fill(d)(rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val run1 = Similarity.semDedup(emb, simThreshold = 0.9, nCells = 4)
      .orderBy("vec_id").collect()
    // Vectors 0 and 1 are near-identical: exactly one survives.
    val dupKept = run1.filter(r => r.getLong(0) <= 1L).map(_.getBoolean(3))
    assert(dupKept.count(identity) == 1, run1.take(2).mkString(","))
    val run2 = Similarity.semDedup(emb, simThreshold = 0.9, nCells = 4)
      .orderBy("vec_id").collect()
    assert(run1.map(_.toString).toSeq === run2.map(_.toString).toSeq)
  }
}
