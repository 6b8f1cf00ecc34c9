package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Outliers}
import graft.queries.TrainOps

/** Round-5 training-data operators: HTML stripping, md5-banded near-dup,
  * rolling-z anomalies, deterministic shuffle/split, centroids, URL parse. */
class TrainOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stripHtml drops script/style, decodes entities, keeps word bounds") {
    val html = Seq(
      "<html><style>b {x}</style><body><h1>Title</h1>" +
        "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" +
        "<script>var bad = 1;</script></body></html>").toDF("h")
    val out = html.select(TextFunctions.stripHtml(col("h"))).as[String].head()
    assert(out === "Title a & b <tag> \"q\" 's' end")
  }

  test("stripHtml: &amp;lt; decodes to the literal &lt;, not <") {
    val out = Seq("x &amp;lt; y").toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).as[String].head()
    assert(out === "x &lt; y")
  }

  test("md5-banded minhash finds exact and near dups, not the distinct doc") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines and shuffles"),
      (4L, "ab")                                        // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearMinhashMd5(docs, "text", "doc_id", maxDistance = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) === 0.0)                     // exact dup: dist 0
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.0)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
    assert(pairs.keys.forall { case (a, b) => a < b })
  }

  test("md5-banded minhash recall on planted near-dups matches the xxhash twin") {
    val base = (0 until 10).map { i =>
      (0 until 30).map(t => s"w${i}_$t").mkString(" ")
    }
    val docs = base.zipWithIndex.flatMap { case (text, i) =>
      Seq((2L * i, text), (2L * i + 1, text.replace(s"w${i}_15", "CHANGED")))
    }.toDF("doc_id", "text")
    val found = Dedup.nearMinhashMd5(docs, "text", "doc_id", maxDistance = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found === (0 until 10).map(i => (2L * i, 2L * i + 1)).toSet)
  }

  test("rollingZ flags the spike, not the steady series or warm-up rows") {
    val rows = (1 to 30).map(i => (7L, i, 10.0 + (i % 3))) :+ (7L, 31, 100.0)
    val df = rows.toDF("u", "i", "v")
    val out = Outliers.rollingZ(df, "u", Seq("i"), "v", frame = 20, zMax = 3.0)
      .select("i", "z").as[(Int, Double)].collect().toMap
    assert(out.keySet === Set(31))                      // only the spike
    assert(out(31) > 3.0)
  }

  test("rollingZ never scores rows with fewer than `frame` predecessors") {
    // 10-row series ends before any 20-row window fills: zero output
    val df = (1 to 10).map(i => (1L, i, 1000.0 * i)).toDF("u", "i", "v")
    assert(Outliers.rollingZ(df, "u", Seq("i"), "v", 20, 0.0).count() === 0)
  }

  test("q_shuffle_det is deterministic with dense per-shard positions") {
    val a = TrainOps.qShuffleDet(spark, sf).collect()
    val b = TrainOps.qShuffleDet(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val byShard = a.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("q_split_hash covers every doc with only the three split labels") {
    val out = TrainOps.qSplitHash(spark, sf).collect()
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    val total = out.map(_.getLong(2)).sum
    assert(total === Tables.documents(spark, sf).count())
    // the hash split must put the bulk in train (~90% in expectation)
    val train = out.filter(_.getString(1) == "train").map(_.getLong(2)).sum
    assert(train > total / 2)
  }

  test("q_emb_centroid matches a manually quantized average") {
    val out = TrainOps.qEmbCentroid(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val dims = emb.head._2.length
    assert(out.length === emb.map(_._1).distinct.length * dims)
    // recompute one cell exactly as the operator defines it
    val label0 = emb.filter(_._1 == emb.head._1)
    val manual = label0.map(e =>
      math.floor(e._2(0).toDouble * 1e6).toLong).sum.toDouble /
      (label0.length * 1e6)
    val cell = out.find(r =>
      r.getLong(0) == emb.head._1 && r.getLong(1) == 0L).get.getDouble(3)
    assert(math.abs(cell - manual) < 1e-9)
  }

  test("q_url_parse extracts host, path, query param, fragment, domain") {
    val r = TrainOps.qUrlParse(spark, sf).filter(col("doc_id") === 0).head()
    val doc = Tables.documents(spark, sf).filter(col("doc_id") === 0).head()
    val (src, lang) = (doc.getAs[String]("source"), doc.getAs[String]("lang"))
    assert(r.getAs[String]("host") === s"www.$src.example.com")
    assert(r.getAs[String]("path") === s"/docs/$lang/0")
    assert(r.getAs[String]("q_lang") === lang)
    assert(r.getAs[String]("frag") === "s1")
    assert(r.getAs[String]("domain") === "example.com")
  }

  test("q_html_strip round-trips the document text through the template") {
    val docs = Tables.documents(spark, sf)
    val joined = TrainOps.qHtmlStrip(spark, sf)
      .join(docs.select(col("doc_id"), col("source"), col("text")), "doc_id")
    // clean text = "<source> <source> & docs <text>" with collapsed spaces
    val bad = joined.filter(
      col("clean_md5") =!= md5(concat_ws(" ",
        col("source"), col("source"), lit("& docs"),
        trim(regexp_replace(col("text"), "\\s+", " ")))))
    assert(bad.count() === 0)
  }

  test("substrDupStats marks shared windows and merges adjacent spans") {
    // docs 1 and 2 share tokens a1..a9 (two 8-token windows: pos 0 and 1 in
    // doc 1 → ONE merged span of 9 tokens); doc 3 is unique; doc 4 is too
    // short for any window.
    val shared = (1 to 9).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " x1 x2 x3"),
      (2L, "y1 y2 " + shared),
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.substrDupStats(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_windows") === 5L)  // 12 tokens → 5 windows
    assert(d1.getAs[Long]("n_dup_windows") === 2L)
    assert(d1.getAs[Long]("n_spans") === 1L)    // pos 0,1 merge
    assert(d1.getAs[Long]("max_span_tokens") === 9L)  // run 2 + 7
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_dup_windows") === 0L)
    assert(d3.getAs[Long]("n_spans") === 0L)
  }

  test("substrDupStats counts within-document repetition too") {
    val rep = ((1 to 8) ++ (1 to 8)).map(i => s"t$i").mkString(" ")
    val out = Dedup.substrDupStats(
        Seq((1L, rep)).toDF("doc_id", "text"), "text", "doc_id", k = 8)
      .head()
    // windows at pos 0 and pos 8 are identical → both marked duplicated
    assert(out.getAs[Long]("n_dup_windows") === 2L)
    assert(out.getAs[Long]("n_spans") === 2L)  // pos 0 and 8 not adjacent
  }

  test("q_mixture_plan: shares sum to ~1 and flattening upsamples the tail") {
    val rows = TrainOps.qMixturePlan(spark, sf).collect()
    val (ps, qs) = (rows.map(_.getAs[Double]("p")),
      rows.map(_.getAs[Double]("q")))
    assert(math.abs(ps.sum - 1.0) < 1e-4 && math.abs(qs.sum - 1.0) < 1e-4)
    // temperature flattening: smallest source gains share, largest loses
    val byP = rows.sortBy(_.getAs[Double]("p"))
    assert(byP.head.getAs[Double]("q") >= byP.head.getAs[Double]("p"))
    assert(byP.last.getAs[Double]("q") <= byP.last.getAs[Double]("p"))
  }

  test("q_quality_gate keeps ~90% per source and reports the cut score") {
    TrainOps.qQualityGate(spark, sf).collect().foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(kept <= n && kept >= (0.85 * n).toLong)
      assert(!r.isNullAt(r.fieldIndex("min_kept_score")))
    }
  }

  test("span mask: disjoint in-bounds spans, ~15% coverage, replayable offsets") {
    import spark.implicits._
    val out = TrainOps.qSpanMask(spark, sf)
      .select("doc_id", "span_idx", "start", "masked_span")
      .as[(Long, Long, Long, String)].collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, spans) =>
      val n = texts(id).length
      val k = math.max(1L, n * 15L / 1200L)
      val w = n / k
      assert(spans.length === k.toInt, s"doc $id span count")
      spans.foreach { case (_, s, start, masked) =>
        // replay the offset from first principles
        val hv = java.lang.Long.parseLong(
          md5hex(s"$id|$s|spanmask").take(12), 16)
        assert(start === s * w + 1 + hv % (w - 12 + 1), s"doc $id span $s")
        assert(start >= s * w + 1 && start + 12 - 1 <= (s + 1) * w,
          s"span outside its window: doc $id span $s")
        assert(masked === texts(id).substring(start.toInt - 1,
          start.toInt - 1 + 12), s"masked text mismatch: doc $id span $s")
      }
      // windows are disjoint, so spans are — assert anyway (the invariant
      // the windowed construction exists to guarantee)
      val ranges = spans.map(t => (t._3, t._3 + 11)).sorted.toSeq
      ranges.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 < s2, s"overlap in doc $id")
        case _ =>
      }
      // coverage ~15%: k*12 chars of n, within [7%, 16%] for n >= 160
      if (n >= 160)
        assert(k * 12 >= n * 7 / 100 && k * 12 <= n * 16 / 100,
          s"coverage off: doc $id n=$n k=$k")
    }
  }

  test("embedding dim-corr matches a BigInt brute force over all pairs") {
    import spark.implicits._
    val out = graft.queries.TrainOps.qEmbDimcorr(spark, sf).collect()
    assert(out.length === 20)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val d = vecs.head._2.size
    val q = vecs.map(_._2.map(x =>
      BigInt(math.floor(x.toDouble * 1e6).toLong)).toArray)
    val n = BigInt(q.length)
    val sx = Array.tabulate(d)(i => q.map(_(i)).sum)
    val sxx = Array.tabulate(d)(i => q.map(v => v(i) * v(i)).sum)
    def corr(i: Int, j: Int): Double = {
      val sxy = q.map(v => v(i) * v(j)).sum
      // mirror the ENGINE's float path exactly: each exact integer is
      // cast to double FIRST, then the arithmetic runs in double
      val cov = n.toDouble * sxy.toDouble - sx(i).toDouble * sx(j).toDouble
      val vx = n.toDouble * sxx(i).toDouble - sx(i).toDouble * sx(i).toDouble
      val vy = n.toDouble * sxx(j).toDouble - sx(j).toDouble * sx(j).toDouble
      BigDecimal(cov / (math.sqrt(vx) * math.sqrt(vy)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val brute = (for (i <- 0 until d; j <- i + 1 until d)
      yield (i.toLong, j.toLong, corr(i, j)))
      .map(t => (t._1, t._2, math.abs(t._3), t._3))
      .sortBy(t => (-t._3, t._1, t._2)).take(20)
    assert(out.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
      r.getAs[Double]("abs_corr"), r.getAs[Double]("corr"))).toSeq
      === brute)
  }

  test("lorenz deciles partition customers; cumulative share hits exactly 1000") {
    val out = graft.queries.Aggregations.qLorenz(spark, sf).collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("decile")).toSeq === (1L to 10L))
    val nTotal = out.map(_.getAs[Long]("n_cust")).sum
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(nTotal === nCust)
    // shares are non-decreasing by decile (higher deciles hold more
    // revenue by construction) and the cumulative ends at exactly 1000
    val shares = out.map(_.getAs[Long]("share_permille")).toSeq
    assert(shares === shares.sorted, s"shares not monotone: $shares")
    assert(out.last.getAs[Long]("cum_share_permille") === 1000L)
    val cums = out.map(_.getAs[Long]("cum_share_permille")).toSeq
    assert(cums === cums.sorted)
  }
}
