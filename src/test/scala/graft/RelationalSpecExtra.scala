package graft

import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._
  test("as-of join: matched-but-null value wins over an older non-null") {
    val left = Seq((1L, "k", 100L), (2L, "k", 300L)).toDF("id", "key", "ts")
    val right = Seq(("k", 50L, Some(7.0)), ("k", 200L, None))
      .toDF("key", "ts", "value")
    val got = graft.operators.AsOf.asOfJoin(left, right, "key", "ts", "value")
      .select($"id", $"asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // ts=100 → right@50 (7.0); ts=300 → right@200, whose value is NULL:
    // true ASOF semantics must surface the null, not resurrect 7.0
    assert(got(1L) == Some(7.0))
    assert(got(2L) == None)
  }

  test("as-of join: left row earlier than any right row gets null") {
    val left = Seq((1L, "k", 10L)).toDF("id", "key", "ts")
    val right = Seq(("k", 50L, Some(7.0))).toDF("key", "ts", "value")
    val got = graft.operators.AsOf.asOfJoin(left, right, "key", "ts", "value")
    assert(got.filter($"asof_value".isNull).count() == 1)
  }
}

class ApproxSpec extends SparkSpec {
  import spark.implicits._
  test("approx_count_distinct within 5% of exact per group") {
    val approx = SparkEntry.queries("q09_approx_distinct")(spark, sf)
      .select("l_returnflag", "approx_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      withClue(s"$k approx=$a exact=$e") {
        assert(math.abs(a - e).toDouble / e < 0.05)
      }
    }
  }
}
