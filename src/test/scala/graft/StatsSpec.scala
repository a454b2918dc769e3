package graft

import org.apache.spark.sql.functions._

/** Properties of the distribution-stats and corpus-stats operators
  * (q47-q49, q67-q69) beyond the DuckDB hash gate. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("q47: percentiles are monotone and inside the group's range") {
    val rows = operators.Stats.queries("q47_group_percentiles")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p75, p90) =
        Seq("p25", "p50", "p75", "p90").map(c => r.getAs[Double](c))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
    }
    val (mn, mx) = Tables.lineitem(spark, sf)
      .agg(min($"l_extendedprice"), max($"l_extendedprice"))
      .as[(Double, Double)].head()
    rows.foreach { r =>
      assert(r.getAs[Double]("p25") >= mn && r.getAs[Double]("p90") <= mx)
    }
  }

  test("q48: histogram bin counts sum to the table row count") {
    val h = operators.Stats.queries("q48_price_histogram").fn(spark, sf)
    val binned = h.agg(sum($"n_orders")).as[Long].head()
    assert(binned == Tables.orders(spark, sf).count())
  }

  test("q49: repetition ratios live in [0, 1]") {
    val rows = operators.TextAnalysis.queries("q49_repetition")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_word_ratio")
      val top = r.getAs[Double]("top_bigram_frac")
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
    }
  }

  test("q97: CMS-prefiltered heavy hitters equal the naive exact count") {
    val grams = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextOps.shingles($"text", 3)).as("g"))
    val naive = grams.groupBy($"g").agg(count(lit(1)).as("n"))
      .filter($"n" >= 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = operators.TextAnalysis.queries("q97_heavy_hitters")
      .fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS overcounts only: the prune keeps every true heavy hitter and
    // the exact confirm kills every impostor — any diff is a prune bug
    assert(got == naive)
    assert(got.nonEmpty, "threshold must stay non-degenerate on the fixture")
  }

  test("CMS probe: estimate is never below the true count") {
    import graft.functions.CmsEstimate
    // skewed stream: key k occurs k times (1..60) — plenty of collisions
    // in a deliberately tiny sketch (eps=0.01) to exercise overcounting
    val stream = spark.range(1, 61)
      .select(explode(array_repeat($"id", $"id".cast("int"))).as("k"))
    val cms = CmsEstimate.buildLongCms(stream, "k", eps = 0.01)
    val est = stream.distinct()
      .select($"k", CmsEstimate.cmsEstimate($"k", cms).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    est.foreach { case (k, e) =>
      assert(e >= k, s"key $k true count $k estimated $e: CMS undercounted")
    }
  }

  test("q67: exactly <=3 terms per doc, ranks contiguous, scores non-increasing") {
    val rows = operators.TextAnalysis.queries("q67_tfidf_topk")
      .fn(spark, sf)
      .select($"doc_id", $"rk", $"rarity_score")
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1)
    rows.foreach { case (doc, ts) =>
      val byRank = ts.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length), s"doc $doc")
      assert(byRank.length <= 3)
      byRank.sliding(2).foreach {
        case Array((_, _, s1), (_, _, s2)) => assert(s1 >= s2, s"doc $doc")
        case _ =>
      }
    }
  }

  test("q68: one centroid per (label, dim), inside the value envelope") {
    val c = operators.Similarity.queries("q68_label_centroid").fn(spark, sf)
    val labels = Tables.embeddings(spark, sf).select($"label").distinct().count()
    assert(c.count() == labels * 64)
    assert(c.filter(abs($"centroid") > 1.0).count() == 0)
  }

  test("q69: quantization error bounded by half a step when unsaturated") {
    val rows = operators.Similarity.queries("q69_quantize_int8")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // half-step = 1/800 per dim -> per-dim squared error <= 1.5625e-6
    // -> mse_ppm <= 1.5625 for rows with zero saturated dims
    rows.filter(_.getAs[Int]("n_sat") == 0).foreach { r =>
      assert(r.getAs[Double]("mse_ppm") <= 1.5625 + 1e-9)
      assert(r.getAs[Long]("l1_q") > 0)
    }
  }

  test("q111: gram-local pair generation equals the naive self-join") {
    val sg = Tables.documents(spark, sf)
      .select($"source", explode(graft.functions.NGramHash64
        .ngramHashes(graft.functions.TextOps.words($"text"), 5)).as("g"))
      .distinct()
    val naive = sg.as("a").join(sg.as("b"),
        $"a.g" === $"b.g" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("sa"), $"b.source".as("sb"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val fast = operators.TextAnalysis.queries("q111_source_overlap")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fast == naive)
  }

  test("q110: per-query top-k is contiguously ranked with non-increasing scores") {
    val rows = operators.TextAnalysis.queries("q110_bm25_batch")
      .fn(spark, sf).collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Double]("bm25"), r.getAs[Long]("doc_id")))
    val queryIds = operators.TextAnalysis.Bm25Batch.map(_._1).distinct.toSet
    assert(rows.map(_._1).toSet == queryIds, "every query must return hits")
    rows.groupBy(_._1).foreach { case (qid, hits) =>
      val sorted = hits.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to hits.length),
        s"query $qid: ranks must be 1..k")
      assert(hits.length <= operators.TextAnalysis.Bm25TopK)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._4 < b._4),
            s"query $qid: order must be score desc, doc_id asc")
        case _ =>
      }
    }
  }

  test("maintained BM25 index stats == full-rebuild stats, and the indexed top-k == q105 (q133)") {
    // the retrieval crawl contract: folding a batch's exact-integer
    // deltas into the stats row must land on EXACTLY the full corpus's
    // stats (n, sumdl, dfs are distributive over a new-doc partition),
    // and scoring from the maintained index must reproduce q105
    import operators.TextAnalysis._
    val docs = Tables.documents(spark, sf)
    val cutoff = (docs.agg(max($"doc_id")).head.getLong(0) + 1) * 7 / 10
    val prefixPd = bm25PerDoc(docs.filter($"doc_id" < cutoff), Bm25Query)
    val batchPd = bm25PerDoc(docs.filter($"doc_id" >= cutoff), Bm25Query)
    val maintained = bm25IndexMaintain(
      bm25IndexStats(prefixPd, Bm25Query), batchPd, Bm25Query)
      .collect()(0).toSeq
    val rebuilt = bm25IndexStats(bm25PerDoc(docs, Bm25Query), Bm25Query)
      .collect()(0).toSeq
    assert(maintained == rebuilt)
    // empty crawl batch: the stats fold must be the exact identity
    val empty = bm25PerDoc(docs.limit(0), Bm25Query)
    val identity = bm25IndexMaintain(
      bm25IndexStats(bm25PerDoc(docs, Bm25Query), Bm25Query), empty, Bm25Query)
      .collect()(0).toSeq
    assert(identity == rebuilt)
    val fromIndex = bm25TopKFromIndex(
      prefixPd.unionByName(batchPd),
      bm25IndexMaintain(bm25IndexStats(prefixPd, Bm25Query), batchPd, Bm25Query)
        .withColumn("avgdl", $"sumdl".cast("double") / $"n"),
      Bm25Query)
      .collect().map(_.toSeq).toSet
    val full = SparkEntry.queries("q105_bm25_topk")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(fromIndex == full && full.nonEmpty)
  }
}
