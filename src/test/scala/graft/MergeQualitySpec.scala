package graft

import graft.operators.Quality
import graft.warehouse.Merge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Properties for the round-9 additions: generic MERGE upsert routing,
  * the single-scan DQ rules engine, salted per-group top-k ≡ plain
  * window, and changelog compaction ≡ its window formulation. */
class MergeQualitySpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "amt")

  test("Merge.upsert routes update/delete/insert/keep correctly") {
    val batch = Seq(
      (2L, "b2", 25.0, "U"),  // matched update
      (3L, "c", 30.0, "D"),   // matched delete
      (9L, "x", 0.0, "D"),    // unmatched delete -> no-op
      (5L, "e", 50.0, "I")    // unmatched insert
    ).toDF("k", "name", "amt", "op")
    val out = Merge.upsert(target, batch, "k", deleteWhen = col("op") === "D")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("Merge.upsert preserves target schema and is idempotent for upsert-only batches") {
    val batch = Seq((2L, "b2", 25.0), (5L, "e", 50.0)).toDF("k", "name", "amt")
    val once = Merge.upsert(target, batch, "k")
    // full-outer padding widens nullability; names and types must hold
    assert(once.schema.map(f => (f.name, f.dataType)) ==
      target.schema.map(f => (f.name, f.dataType)))
    val twice = Merge.upsert(once, batch, "k")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("Merge.upsert rejects a source missing target columns") {
    intercept[IllegalArgumentException] {
      Merge.upsert(target, Seq((1L, "a")).toDF("k", "name"), "k")
    }
  }

  test("Quality.report counts violations and runs all rules in ONE scan") {
    val df = Seq(
      (1L, 5.0, "ok"), (2L, -1.0, "ok"), (3L, 0.0, "bad"), (4L, 2.0, "ok")
    ).toDF("id", "v", "status")
    // dotted rule names are display strings, not identifiers (q115 uses
    // "table.rule" names — they must not hit column resolution)
    val rep = Quality.report(df, Seq(
      Quality.Rule("t.nonpositive_v", $"v" <= 0.0),
      Quality.Rule("t.bad_status", $"status" === "bad")))
    val m = rep.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("t.nonpositive_v" -> 2L, "t.bad_status" -> 1L))
    // one scan: a single scan node in the executed plan (QueryStageExec
    // markers are childless but aren't scans — count real scan leaves)
    rep.collect()
    val scans = graft.plans.PlanWalk.walk(rep.queryExecution.executedPlan)
      .count(_.nodeName.toLowerCase.contains("scan"))
    assert(scans == 1, s"predicate rules must share one scan, saw $scans")
  }

  test("Quality.duplicateCount and orphanCount") {
    val child = Seq((1L, 1), (1L, 1), (2L, 1), (7L, 1)).toDF("fk", "x")
    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("pk")
    val dup = Quality.duplicateCount(child, "dup", Seq("fk", "x")).head
    assert(dup.getString(0) == "dup" && dup.getLong(1) == 1L)
    val orph = Quality.orphanCount(child, "fk", parent, "pk", "orphan").head
    assert(orph.getString(0) == "orphan" && orph.getLong(1) == 1L)
  }

  test("Quality edge cases: empty table -> 0 not NULL; null keys count as values; dup rule names rejected") {
    // ADVICE r9: sum over zero rows is NULL — report must coalesce to 0
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val rep = Quality.report(empty, Seq(Quality.Rule("r.neg", $"v" < 0))).head
    assert(rep.getLong(1) == 0L, "empty table must report 0 violations")
    // ADVICE r9: countDistinct over bare columns DROPS null-key rows —
    // a null-key singleton must NOT be reported as a duplicate, and a
    // null-key PAIR must count exactly one duplicate (struct semantics,
    // the same as DuckDB's count(DISTINCT (a, b)))
    val nullable = Seq(
      (Some(1L), 1), (None, 1), (None, 2), (None, 2), (Some(2L), 1)
    ).toDF("k", "x")
    val d = Quality.duplicateCount(nullable, "d", Seq("k", "x")).head
    assert(d.getLong(1) == 1L,
      "exactly the (null, 2) pair duplicates; null singletons are not dups")
    // duplicate rule names fail fast, not at CreateMap runtime
    intercept[IllegalArgumentException] {
      Quality.report(nullable, Seq(
        Quality.Rule("same", $"x" < 0), Quality.Rule("same", $"x" > 9)))
    }
  }

  test("q116 salted two-stage top-k equals the plain single-window ranking") {
    val salted = SparkEntry.queries("q116_group_topk")(spark, sf)
    val spend = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(28,2)")).cast("double").as("spend"))
    val w = Window.partitionBy($"n_name").orderBy($"spend".desc, $"o_custkey".asc)
    val plain = spend.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q114 hash-agg compaction equals the window formulation; tombstoned keys dropped") {
    val compacted = SparkEntry.queries("q114_cdc_compact")(spark, sf)
    val log = Tables.events(spark, sf).select(
      $"user_id", $"event_id",
      when($"event_type" === "signup", "I")
        .when($"event_type" === "error", "D").otherwise("U").as("op"),
      $"value")
    val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)
    val ref = log
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(
        Window.partitionBy($"user_id")))
      .filter($"rn" === 1 && $"op" =!= "D")
      .select($"user_id", $"event_id".as("last_event_id"),
        $"op".as("last_op"), $"value".as("last_value"), $"n_changes")
    assert(compacted.exceptAll(ref).isEmpty && ref.exceptAll(compacted).isEmpty)
    // every tombstone-latest key is absent
    val latestOps = log.groupBy($"user_id")
      .agg(max_by($"op", $"event_id").as("lo"))
    val deadKeys = latestOps.filter($"lo" === "D").select($"user_id")
    assert(compacted.join(deadKeys, Seq("user_id"), "left_semi").count() == 0)
  }

  test("vocab_encode matches the join-based reference; OOV encodes 0; ids dense 1..V") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val vocab = TextAnalysis.buildVocab(docs, minCount = 2, maxSize = 100)
    assert(vocab.map(_._2) == (1 to vocab.size), "ids must be dense 1..V")
    // ranking contract: counts non-increasing, ties broken by token asc
    val counts = docs.select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vc = vocab.map { case (w, _) => counts(w) }
    assert(vc.zip(vc.tail).forall { case (a, b) => a >= b })
    vocab.zip(vocab.tail).foreach { case ((w1, _), (w2, _)) =>
      if (counts(w1) == counts(w2)) assert(w1 < w2) }
    // native expression ≡ explode-join-regroup reference
    val enc = docs.select($"doc_id",
      graft.functions.VocabEncode.vocabEncode(split($"text", " "), vocab).as("ids"))
      .select($"doc_id", $"ids".cast("array<string>").as("ids"))
      .withColumn("ids", array_join($"ids", ","))
    val vdf = vocab.toDF("w", "id")
    val ref = docs.select($"doc_id", posexplode(split($"text", " ")).as(Seq("p", "w")))
      .join(vdf, Seq("w"), "left")
      .withColumn("id", coalesce($"id", lit(0)))
      .groupBy($"doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct($"p", $"id"))),
        x => x.getField("id").cast("string")), ",").as("ids"))
    assert(enc.exceptAll(ref).isEmpty && ref.exceptAll(enc).isEmpty)
  }

  test("q118 trailing RANGE frame equals the self-join formulation") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"), $"value")
    val out = SparkEntry.queries("q118_trailing_range")(spark, sf)
    val f = ev.select($"user_id".as("f_uid"), $"ts_us".as("f_ts"), $"value".as("f_v"))
    val ref = ev.join(f, $"user_id" === $"f_uid" &&
        $"f_ts" >= $"ts_us" - 3600L * 1000 * 1000 && $"f_ts" <= $"ts_us")
      .groupBy($"event_id", $"user_id", $"ts_us")
      .agg(count(lit(1)).as("trail_1h_n"),
        sum($"f_v".cast("decimal(28,10)")).cast("double").as("trail_1h_value"))
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
  }

  test("Quality.keyProfile: heaviest keys, exact shares, bounded output") {
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")
    val prof = Quality.keyProfile(df, "k", topN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(prof.toSeq == Seq((1L, 6L, 0.6), (2L, 3L, 0.3)))
  }

  test("q120 funnel equals a per-user brute-force replay; stages monotone") {
    val out = SparkEntry.queries("q120_funnel")(spark, sf).head
    val (n1, n2, n3) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(n1 >= n2 && n2 >= n3)
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    var (b1, b2, b3) = (0L, 0L, 0L)
    rows.groupBy(_._1).foreach { case (_, evs) =>
      var (s1, s2, s3) = (false, false, false)
      evs.sortBy(_._2).map(_._3).foreach {
        case "signup" => s1 = true
        case "click" if s1 => s2 = true
        case "purchase" if s2 => s3 = true
        case _ =>
      }
      if (s1) b1 += 1; if (s2) b2 += 1; if (s3) b3 += 1
    }
    assert((n1, n2, n3) == ((b1, b2, b3)))
  }

  test("q121 cohort grid: offset-0 covers every user; retention never exceeds cohort size") {
    val grid = SparkEntry.queries("q121_cohort_retention")(spark, sf).cache()
    assert(grid.filter($"week_offset" < 0).count() == 0)
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    val offset0 = grid.filter($"week_offset" === 0)
      .agg(sum($"n_users")).head.getLong(0)
    assert(offset0 == users, "every user is active in their cohort week")
    val bad = grid.as("g").join(
        grid.filter($"week_offset" === 0)
          .select($"cohort_week", $"n_users".as("size0")), Seq("cohort_week"))
      .filter($"n_users" > $"size0")
    assert(bad.count() == 0)
    grid.unpersist()
  }

  test("q113 merge result: tombstoned keys gone, inserts present, updates applied") {
    // inserts live in the NEGATED keyspace (disjoint from TPC-H's
    // strictly-positive orderkeys at every SF — ADVICE r9)
    val out = SparkEntry.queries("q113_merge_upsert")(spark, sf).cache()
    assert(out.filter($"o_orderkey" % 11 === 0 && $"o_orderkey" > 0L).count() == 0)
    val o = Tables.orders(spark, sf)
    val nIns = o.filter($"o_orderkey" % 13 === 0).count()
    assert(out.filter($"o_orderkey" < 0L).count() == nIns)
    val updated = out.filter($"o_orderkey" % 7 === 0 &&
      $"o_orderkey" % 11 =!= 0 && $"o_orderkey" > 0L)
      .select($"o_orderkey", $"o_totalprice")
    val expect = o.filter($"o_orderkey" % 7 === 0 && $"o_orderkey" % 11 =!= 0)
      .select($"o_orderkey", ($"o_totalprice" + 50.0).as("o_totalprice"))
    assert(updated.exceptAll(expect).isEmpty && expect.exceptAll(updated).isEmpty)
    out.unpersist()
  }
}
