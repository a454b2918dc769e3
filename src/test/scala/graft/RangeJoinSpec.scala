package graft

import graft.operators.{AsOf, Curation, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-5 additions: binned range join (q92) — parity with the naive
  * range predicate plus the no-nested-loop plan guarantee — and the
  * LM-score / train-split invariants (q90, q91). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("q92: binned range join equals the naive theta-join, with no nested loop") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts div 1000"))
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("win_id"), $"ts_us".as("wstart"),
        ($"ts_us" + 300000000L).as("wend"))
    val clicks = ev.filter($"event_type" === "click").select($"ts_us", $"value")

    val binned = AsOf.rangeJoin(clicks, windows, "ts_us", "wstart", "wend",
      binWidth = 300000000L)
      .groupBy($"win_id").agg(count(lit(1)).as("n"))
    // naive formulation: Spark plans the pure range predicate as a
    // nested-loop join — correct at test SF, quadratic at scale
    val naive = clicks.join(windows,
      $"ts_us" >= $"wstart" && $"ts_us" < $"wend")
      .groupBy($"win_id").agg(count(lit(1)).as("n"))
    val b = binned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nv = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == nv, s"binned=${b.size} naive=${nv.size} windows differ")
    assert(b.nonEmpty)

    // the point of the operator: the executed plan joins on the bin key,
    // never a nested loop
    binned.collect()
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val loops = walk(binned.queryExecution.executedPlan)
      .collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(loops.isEmpty, "range join fell back to a nested loop")
  }

  test("rangeJoin: empty and inverted intervals match nothing, cheaply") {
    val pts = Seq(1L, 50L, 999L).toDF("p")
    val ivs = Seq((1L, 100L, 100L), (2L, 100L, 100L - 70L * 1000L))
      .toDF("iv_id", "s", "e")
    val out = AsOf.rangeJoin(pts, ivs, "p", "s", "e", binWidth = 10L)
    assert(out.count() == 0)
  }

  test("q92: a bin-width narrower than the span still finds every match") {
    // intervals spanning many bins: replication must not drop or double-
    // count matches (sequence covers every touched bin exactly once)
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts div 1000"))
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("win_id"), $"ts_us".as("wstart"),
        ($"ts_us" + 300000000L).as("wend"))
    val clicks = ev.filter($"event_type" === "click").select($"ts_us", $"value")
    val wide = AsOf.rangeJoin(clicks, windows, "ts_us", "wstart", "wend",
      binWidth = 300000000L).count()
    val narrow = AsOf.rangeJoin(clicks, windows, "ts_us", "wstart", "wend",
      binWidth = 7000000L).count()
    assert(wide == narrow)
  }

  test("rangeJoin: shared column names are rejected; oversized spans raise clearly") {
    val pts = Seq(1L).toDF("p")
    // shared name: the equi-join would resolve ambiguously — must refuse
    val clash = Seq((1L, 0L, 10L)).toDF("p", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.rangeJoin(pts, clash, "p", "s", "e", binWidth = 10L)
    }
    assert(e1.getMessage.contains("share column names"))
    // a caller-owned __bin0 column must not collide with the internal key
    val withBin = Seq((1L, 0L, 10L, 7L)).toDF("iv", "s", "e", "__bin0")
    assert(AsOf.rangeJoin(pts, withBin, "p", "s", "e", binWidth = 10L)
      .columns.contains("__bin0")) // caller's column survives untouched
    // an interval spanning more bins than the cap fails with the
    // operator's message, not sequence()'s length error
    val huge = Seq((1L, 0L, Long.MaxValue / 4)).toDF("iv", "s", "e")
    val e2 = intercept[Exception] {
      AsOf.rangeJoin(pts, huge, "p", "s", "e", binWidth = 10L,
        maxBinsPerInterval = 1000L).count()
    }
    val msgs = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("spans more than 1000"), s"got: $msgs")
  }

  test("q90: LM scores are valid log-probs and n_tokens matches the tokenizer") {
    val scored = TextAnalysis.queries("q90_lm_score").fn(spark, sf)
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        size(graft.functions.TextOps.words($"text")).cast("long").as("nt"))
    val joined = scored.join(toks, "doc_id").collect()
    assert(joined.length == Tables.documents(spark, sf).count())
    val totalByLang = Tables.documents(spark, sf)
      .select($"lang", explode(graft.functions.TextOps.words($"text")))
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    joined.foreach { r =>
      val lp = r.getAs[Double]("avg_log2p")
      // every token occurs at least once in its own doc: p ∈ [1/N_lang, 1]
      val floor = math.log(1.0 / totalByLang(r.getAs[String]("lang"))) / math.log(2)
      // ±5e-4: the operator quantizes to 3 dp, which can nudge a doc
      // sitting exactly on the floor (every token unique) just below it
      assert(lp <= 0.0 && lp >= floor - 0.001,
        s"doc ${r.getAs[Long]("doc_id")}: $lp")
      assert(r.getAs[Long]("n_tokens") == r.getAs[Long]("nt"))
    }
  }

  test("q91: splits partition the corpus and are stable across evaluations") {
    val out = Curation.queries("q91_train_split").fn(spark, sf)
    val rows = out.collect()
    val byCorpus = Tables.documents(spark, sf)
      .groupBy($"lang").agg(count(lit(1)).as("n"), sum($"n_chars").as("c"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // per language, the three splits sum back to the corpus exactly
    byCorpus.foreach { case (lang, (n, c)) =>
      val mine = rows.filter(_.getAs[String]("lang") == lang)
      assert(mine.map(_.getAs[Long]("n_docs")).sum == n, s"$lang doc total")
      assert(mine.map(_.getAs[Long]("n_chars")).sum == c, s"$lang char total")
    }
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "val", "test"))
    // train dominates (98% expected share)
    val train = rows.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(train.toDouble / total > 0.9)
    val again = Curation.queries("q91_train_split").fn(spark, sf).collect()
    assert(again.map(_.toString).sorted.toSeq == rows.map(_.toString).sorted.toSeq)
  }
}
