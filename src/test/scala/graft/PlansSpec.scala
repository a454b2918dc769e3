package graft

import graft.plans.{GraftExtensions, WhenChainToMap}
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
