package graft

import graft.plans.{GraftExtensions, RangeJoinBinning, WhenChainToMap}
import org.apache.spark.sql.functions._

/** The custom Catalyst surface: CASE-ladder→map-lookup optimizer rule and
  * SQL registration of the native minhash expression. */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private val pairs: Seq[(String, String)] =
    (0 until 52).map(i => s"country_$i" -> s"borrower_$i")

  private def ladder = pairs.foldLeft(lit(null).cast("string")) {
    case (acc, (k, v)) => when($"c_name" === k, v).otherwise(acc)
  }

  test("WhenChainToMap rewrites a 52-branch ladder to one map lookup") {
    spark.experimental.extraOptimizations = Seq(WhenChainToMap)
    try {
      val df = Tables.customer(spark, sf).select($"c_custkey",
        coalesce(ladder, $"c_name").as("resolved"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("map_from") || optimized.contains("element_at")
        || optimized.contains("keys:"), optimized.take(800))
      assert(!optimized.contains("CASE WHEN"), optimized.take(800))
      // semantics: no fixture key matches, so every row falls through
      val n = df.filter($"resolved" === $"c_name").count()
      assert(n == Tables.customer(spark, sf).count())
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite preserves first-match and hit semantics") {
    spark.experimental.extraOptimizations = Seq(WhenChainToMap)
    try {
      // 10 branches incl. a duplicate key with a different value: the
      // FIRST must win, exactly like the CASE ladder
      val branches = (0 until 9).map(i => (s"k$i", s"v$i")) :+ ("k0" -> "SHADOWED")
      val expr = branches.reverse.foldLeft(lit("MISS")) {
        case (acc, (k, v)) => when($"key" === k, v).otherwise(acc)
      }
      // parquet-backed input: a LocalRelation would be evaluated whole by
      // ConvertToLocalRelation and bypass the rule
      val dir = java.nio.file.Files.createTempDirectory("graft_keys").toString
      Seq("k0", "k3", "zzz", null.asInstanceOf[String]).toDF("key")
        .write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir).select($"key", expr.as("out"))
      val got = df.collect().map(r => Option(r.getString(0)).orNull -> r.getString(1)).toMap
      assert(got("k0") == "v0")
      assert(got("k3") == "v3")
      assert(got("zzz") == "MISS")
      assert(got(null) == "MISS")
      assert(!df.queryExecution.optimizedPlan.toString.contains("CASE WHEN"))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("minhash_sig is callable from SQL after registration") {
    GraftExtensions.registerFunctions(spark.sessionState.functionRegistry)
    val r = spark.sql(
      "SELECT size(minhash_sig(array('a','b','c'), 8)) AS k, " +
        "minhash_sig(array('a','b'), 4) = minhash_sig(array('b','a'), 4) AS order_invariant")
      .head
    assert(r.getInt(0) == 8)
    assert(r.getBoolean(1))
  }

  test("RangeJoinBinning: inequality-only join rewrites to a binned equi-join, same rows, no nested loop") {
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    spark.experimental.extraOptimizations = Seq(RangeJoinBinning)
    try {
      val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts div 1000"))
      val windows = ev.filter($"event_type" === "error")
        .select($"event_id".as("win_id"), $"ts_us".as("wstart"),
          ($"ts_us" + 300000000L).as("wend"))
      val clicks = ev.filter($"event_type" === "click").select($"ts_us", $"value")
      def q = clicks.join(windows, $"ts_us" >= $"wstart" && $"ts_us" < $"wend")
        .groupBy($"win_id").agg(count(lit(1)).as("n"))
      // conf unset: Spark's fallback plan for the pure range predicate
      val base = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set(RangeJoinBinning.ConfKey, "300000000")
      val opt = q
      val got = opt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == base)
      assert(got.nonEmpty)
      val loops = walk(opt.queryExecution.executedPlan)
        .collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(loops.isEmpty,
        "rule did not fire: the range join still nested-loops\n" +
          opt.queryExecution.executedPlan.toString.take(1500))
    } finally {
      spark.conf.unset(RangeJoinBinning.ConfKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("RangeJoinBinning: negative domains bin correctly and equi-joins stay untouched") {
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.GenerateExec
    spark.experimental.extraOptimizations = Seq(RangeJoinBinning)
    try {
      spark.conf.set(RangeJoinBinning.ConfKey, "7")
      // points and intervals astride zero: truncating division plateaus
      // near 0 — coverage must still hold (residual keeps exactness)
      val pts = (-40L to 40L by 3).toDF("p")
      val ivs = Seq((1L, -35L, -20L), (2L, -5L, 9L), (3L, 12L, 33L))
        .toDF("iv_id", "s", "e")
      def q = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
        .select($"iv_id", $"p")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        p <- -40L to 40L by 3
        (id, s, e) <- Seq((1L, -35L, -20L), (2L, -5L, 9L), (3L, 12L, 33L))
        if p >= s && p < e
      } yield (id, p)).toSet
      assert(got == want)
      // a join that already has an equi key must not be exploded
      val eq = pts.withColumn("k", $"p" % 5)
        .join(ivs.withColumn("k", $"iv_id" % 5), Seq("k"))
      eq.collect()
      val gens = walk(eq.queryExecution.executedPlan)
        .collect { case g: GenerateExec => g }
      assert(gens.isEmpty, "rule fired on an equi-join")
    } finally {
      spark.conf.unset(RangeJoinBinning.ConfKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("RangeJoinBinning: a hot interval trips the max-bins guard loudly") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBinning)
    try {
      spark.conf.set(RangeJoinBinning.ConfKey, "2")
      spark.conf.set(RangeJoinBinning.MaxBinsKey, "4")
      val pts = Seq(1L, 5L).toDF("p")
      def q(ivs: org.apache.spark.sql.DataFrame) =
        pts.join(ivs, $"p" >= $"s" && $"p" < $"e").select($"iv_id", $"p")
      // within the cap: works
      assert(q(Seq((1L, 0L, 7L)).toDF("iv_id", "s", "e")).count() == 2)
      // one interval spanning > 4 bins: loud failure, not a blow-up
      val wide = Seq((2L, 0L, 100L)).toDF("iv_id", "s", "e")
      val ex = intercept[Exception](q(wide).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      assert(msgs(ex).exists(m => m != null && m.contains("RangeJoinBinning")),
        s"unexpected error: ${ex.getMessage}")
    } finally {
      spark.conf.unset(RangeJoinBinning.ConfKey)
      spark.conf.unset(RangeJoinBinning.MaxBinsKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("RangeJoinBinning: NULL and inverted bounds drop rows like the unrewritten join") {
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.GenerateExec
    spark.experimental.extraOptimizations = Seq(RangeJoinBinning)
    try {
      spark.conf.set(RangeJoinBinning.ConfKey, "2")
      spark.conf.set(RangeJoinBinning.MaxBinsKey, "8")
      val pts = Seq(1L, 3L, 5L).toDF("p")
      val ivs = Seq(
        (1L, Option(0L), Option(4L)),         // normal: matches p=1, p=3
        // NULL bounds fail the range predicate in the unrewritten join,
        // so the rewrite must DROP them — the pre-fix guard put
        // RaiseError in If's false branch, which a NULL span predicate
        // reaches (If is false on NULL), failing the whole query
        (2L, Option.empty[Long], Option(4L)),
        (3L, Option(0L), Option.empty[Long]),
        // inverted interval: negative span slips past the max-bins
        // guard, and a default-step Sequence would DESCEND from
        // bin(2^40) to bin(0) — ~5·10^11 replicas. Must emit nothing,
        // and this test completing at all proves there's no blow-up.
        (4L, Option(1L << 40), Option(0L))
      ).toDF("iv_id", "s", "e")
      def q = pts.join(ivs, $"p" >= $"s" && $"p" < $"e").select($"iv_id", $"p")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 1L), (1L, 3L)), s"got $got")
      // the rewrite must actually have fired for this to test anything
      val gens = walk(q.queryExecution.executedPlan)
        .collect { case g: GenerateExec => g }
      assert(gens.nonEmpty, "rule did not fire — test is vacuous")
    } finally {
      spark.conf.unset(RangeJoinBinning.ConfKey)
      spark.conf.unset(RangeJoinBinning.MaxBinsKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("the full native-function surface is callable from SQL") {
    // every config-free codegen'd expression must be reachable by a
    // plain spark.sql user — the library-completeness contract of the
    // extensions entry point
    GraftExtensions.registerFunctions(spark.sessionState.functionRegistry)
    val r = spark.sql("""
      SELECT simhash64(array('a','b','a')) AS sh,
             size(ngram_hash64(array('a','b','c'), 2)) AS ng,
             ngram_strings(array('a','b','c'), 2) AS ns,
             sorted_intersect_count(array(1L, 3L, 7L), array(3L, 7L, 9L)) AS ic,
             size(cdc_blocks(array('a','b','c'))) AS cb
    """).head
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 2)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) >= 1)
    // SQL and DataFrame paths must produce IDENTICAL values (one
    // implementation behind both surfaces)
    import graft.functions.TextOps
    val viaSql = spark.sql("SELECT simhash64(array('x','y'))").head.getLong(0)
    val viaDf = spark.range(1)
      .select(TextOps.simhash(org.apache.spark.sql.functions.lit("x y")))
      .head.getLong(0)
    assert(viaSql == viaDf)
  }
}
