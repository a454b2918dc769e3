package graft

import org.apache.spark.sql.functions._

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
