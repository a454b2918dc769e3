package graft

import graft.operators.Warehouse
import graft.warehouse.{Scd, ScdSpec, SurrogateKeys}
import org.apache.spark.sql.functions._

/** SCD invariants per SURVEY.md §5 (property checks): single current row
  * per BK, expiry bookkeeping, merge idempotence, SK determinism. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Warehouse.custSpec
  private lazy val dim0 = Scd.initialLoad(Tables.customer(spark, sf), spec, "2024-01-01")
  private lazy val merged = Scd.merge(dim0, Warehouse.batch2(spark, sf), spec, "2024-02-01")

  test("initial load: one row per BK, SKs are dense 1..n") {
    val n = dim0.count()
    assert(dim0.select("c_custkey").distinct().count() == n)
    val skStats = dim0.agg(min("sk"), max("sk"), countDistinct("sk")).head
    assert(skStats.getLong(0) == 1L)
    assert(skStats.getLong(1) == n)
    assert(skStats.getLong(2) == n)
  }

  test("SK assignment is deterministic across runs and matches global order") {
    val a = SurrogateKeys.assign(Tables.customer(spark, sf), Seq("c_custkey"), "sk")
      .select("c_custkey", "sk").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = SurrogateKeys.assign(
      Tables.customer(spark, sf).repartition(7), Seq("c_custkey"), "sk")
      .select("c_custkey", "sk").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
    // global-order property: after sorting by key, sks are exactly 1..n
    assert(a.sortBy(_._1).map(_._2).toSeq == (1L to a.length.toLong))
  }

  test("merge: at most one current row per BK; expired rows have end_date") {
    val curPerBk = merged.filter($"is_current")
      .groupBy("c_custkey").count().agg(max("count")).head.getLong(0)
    assert(curPerBk == 1L)
    assert(merged.filter(!$"is_current" && $"end_date".isNull).count() == 0)
    assert(merged.filter($"is_current" && $"end_date".isNotNull).count() == 0)
  }

  test("merge routing counts: scd2 keys got expired + reinserted, new keys inserted") {
    val c = Tables.customer(spark, sf)
    val scd2Keys = c.filter($"c_custkey" % 7 === 0 && $"c_custkey" % 11 =!= 0).count()
    val newKeys = c.filter($"c_custkey" % 13 === 0).count()
    assert(merged.filter(!$"is_current").count() == scd2Keys)
    assert(merged.count() == c.count() + scd2Keys + newKeys)
  }

  test("merge idempotence: re-merging the same batch is a no-op") {
    val again = Scd.merge(merged, Warehouse.batch2(spark, sf), spec, "2024-03-01")
    assert(again.count() == merged.count())
    assert(again.filter($"start_date" === "2024-03-01").count() == 0)
    val a = merged.orderBy("sk").collect()
    val b = again.orderBy("sk").collect()
    assert(a.sameElements(b))
  }

  test("merge drops null-BK batch rows: ≤1-current-per-BK invariant holds") {
    // a null BK can never match the equality join, so keeping such a row
    // would re-insert it as 'new' on EVERY batch — the engine drops it at
    // the dedup gate instead of relying on every caller to pre-filter
    val nullRow = Tables.customer(spark, sf).limit(1)
      .withColumn("c_custkey", lit(null).cast("long"))
    val batch = Warehouse.batch2(spark, sf).unionByName(nullRow)
    val merged = Scd.merge(dim0, batch, spec, "2024-02-01")
    val baseline = Scd.merge(dim0, Warehouse.batch2(spark, sf), spec, "2024-02-01")
    assert(merged.count() == baseline.count())
    assert(merged.filter($"c_custkey".isNull).count() == 0)
    // and re-merging the same batch stays stable (idempotent wrt null BKs)
    val again = Scd.merge(merged, batch, spec, "2024-03-01")
    assert(again.filter($"c_custkey".isNull).count() == 0)
  }

  test("within-batch duplicate BKs are deduplicated deterministically") {
    val dup = Tables.customer(spark, sf).limit(10)
    val doubled = dup.unionByName(dup.withColumn("c_acctbal", $"c_acctbal" + 1))
    val loaded = Scd.initialLoad(doubled, spec, "2024-01-01")
    assert(loaded.count() == 10)
    // deterministic pick: smallest attr tuple wins (ORDER BY attrs)
    val bals = loaded.join(dup.select($"c_custkey", $"c_acctbal".as("orig")), "c_custkey")
    assert(bals.filter($"c_acctbal" =!= least($"orig", $"orig" + 1)).count() == 0)
  }

  test("q112 as-of lookup: at most one version per probe; SCD routing visible") {
    val rows = Warehouse.queries("q112_dim_asof").fn(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getDate(1).toString),
        Option(r.get(2)).map(_ => r.getLong(2))))
    // every (bk, asof) probe appears exactly once — the validity ranges
    // are disjoint, so the range-residual join can never fan out
    assert(rows.map(_._1).distinct.length == rows.length)
    val byProbe = rows.toMap
    val merged = this.merged.collect()
    merged.groupBy(_.getAs[Long]("c_custkey")).foreach { case (bk, vs) =>
      // the 2024-03-01 probe always resolves to the current version
      val current = vs.find(_.getAs[Boolean]("is_current")).get
      assert(byProbe((bk, "2024-03-01")).contains(current.getAs[Long]("sk")))
      // keys born in the merge (start 2024-02-01 only) have no valid
      // version at 2024-01-15 — the probe row survives with a null sk
      if (vs.forall(_.getAs[java.sql.Date]("start_date").toString == "2024-02-01"))
        assert(byProbe((bk, "2024-01-15")).isEmpty, s"bk $bk")
      // SCD2-expired keys resolve the early probe to the EXPIRED version
      vs.find(v => !v.getAs[Boolean]("is_current")).foreach { old =>
        assert(byProbe((bk, "2024-01-15")).contains(old.getAs[Long]("sk")), s"bk $bk")
      }
    }
  }

  test("Summary.maintain == summarize of the Merge.upsert result (incremental == recompute)") {
    // the summary-table contract behind q127: applying the batch's
    // deltas to the old summary must equal rebuilding the summary from
    // the merged base — exactly, because measures fold through DECIMAL
    import graft.warehouse.{Merge, Summary}
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val del = o.filter($"o_orderkey" % 11 === 0).withColumn("op", lit("D"))
    val upd = o.filter($"o_orderkey" % 7 === 0 && $"o_orderkey" % 11 =!= 0)
      .withColumn("o_orderstatus", lit("P"))
      .withColumn("o_totalprice", $"o_totalprice" + 50.0)
      .withColumn("op", lit("U"))
    val ins = o.filter($"o_orderkey" % 13 === 0).select(
      (-$"o_orderkey" - 1L).as("o_orderkey"), lit("N").as("o_orderstatus"),
      lit(1000.0).as("o_totalprice"), lit("I").as("op"))
    val batch = del.unionByName(upd).unionByName(ins)
    // compare the EXACT decimal accumulator, not just the display double:
    // maintain must fold deltas into __t (the advisor's 100 TB exactness
    // contract), so incremental __t equals recomputed __t bit-for-bit
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("grp"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("__t"),
        r.getAs[Double]("total"))
    val incr = Summary.maintain(
      Summary.summarize(o, $"o_orderstatus", $"o_totalprice"),
      o, batch, "o_orderkey", $"o_orderstatus", $"o_totalprice",
      deleteWhen = $"op" === "D")
      .collect().map(key).toSet
    val merged = Merge.upsert(o, batch, "o_orderkey", deleteWhen = col("op") === "D")
    val scratch = Summary.summarize(merged, $"o_orderstatus", $"o_totalprice")
      .collect().map(key).toSet
    assert(incr == scratch)
    assert(incr.exists(_._1 == "N") && incr.exists(_._1 == "P"),
      "batch must exercise inserts and group migration")
    // empty batch: maintain must be the exact identity (including the
    // decimal accumulator — a lossy re-derivation would drift here)
    val base = Summary.summarize(o, $"o_orderstatus", $"o_totalprice")
    val same = Summary.maintain(base, o, batch.limit(0), "o_orderkey",
      $"o_orderstatus", $"o_totalprice", deleteWhen = $"op" === "D")
      .collect().map(key).toSet
    assert(same == base.collect().map(key).toSet)
  }

  test("buildChecked raises on dangling keys at first action, naming the dim") {
    // the r10 probe fusion turned the eager assertNoDangling pass into a
    // per-row guard inside the lookup pass — the fail-on-no-match
    // contract (SURVEY S9/NoMatchBehavior=0) must still hold, now at the
    // fact's first action, and must name the offending dim key
    import graft.warehouse.FactBuilder
    val fact = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("k", "dim_key")
    val dim = Seq((10L, "a"), (20L, "b")).toDF("d_key", "attr")
    val lookups = Seq(FactBuilder.Lookup(dim, col("dim_key"), "d_key",
      Seq("attr" -> "attr")))
    val checked = FactBuilder.buildChecked(fact, lookups) // lazy: no raise yet
    val e = intercept[Exception] { checked.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("d_key")),
      s"error must name the dangling dim key: ${msgs(e).mkString(" | ")}")
    // and the happy path equals probe+build
    val ok = fact.filter($"dim_key" =!= 99L)
    val a = FactBuilder.buildChecked(ok, lookups).collect().map(_.toSeq).toSet
    FactBuilder.assertNoDangling(ok, lookups)
    val b = FactBuilder.build(ok, lookups).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("buildChecked keeps its joins LeftOuter through the optimizer (assert_true not treated as null-filtering)") {
    // pin the Spark-4.x EliminateOuterJoin behavior buildChecked leans
    // on (advisor r10): if a Spark upgrade ever lets the rule classify
    // the throwing assert_true filter as null-filtering, the LEFT joins
    // become INNER and dangling rows are dropped BEFORE the guard fires
    // — this plan-shape pin turns that silent data loss into a red test
    import graft.warehouse.FactBuilder
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("k", "dim_key")
    val dimA = Seq((10L, "a"), (20L, "b")).toDF("da_key", "attr_a")
    val dimB = Seq((10L, "x"), (20L, "y")).toDF("db_key", "attr_b")
    val checked = FactBuilder.buildChecked(fact, Seq(
      FactBuilder.Lookup(dimA, col("dim_key"), "da_key", Seq("attr_a" -> "attr_a")),
      FactBuilder.Lookup(dimB, col("dim_key"), "db_key", Seq("attr_b" -> "attr_b"))))
    val joinTypes = checked.queryExecution.optimizedPlan.collect {
      case j: Join => j.joinType }
    assert(joinTypes.nonEmpty && joinTypes.forall(_ == LeftOuter),
      s"lookup joins must survive as LeftOuter, got $joinTypes")
  }
}
