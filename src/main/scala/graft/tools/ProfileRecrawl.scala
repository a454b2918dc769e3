package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off distribution probe behind the q188 recrawl constants: prints
  * the s_sum spread of the q169 host-quality rollup at both catalog
  * scales, plus the frontier-size/host counts, so RecrawlAgeCredit /
  * RecrawlThreshold land where the refresh gaps actually spread over
  * 1..horizon (see the scaladoc at graft.operators.Crawl.RecrawlGap). */
object ProfileRecrawl {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("profile-recrawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.Tables.documents(spark, d)
      val roll = graft.operators.NgramLm.hostQualityRollup(docs)
        .select(col("dst_host"), col("s_sum")).cache()
      val canon = graft.operators.Crawl.canonFrontier(docs)
      val joined = canon.join(roll, Seq("dst_host"), "left")
        .select(coalesce(col("s_sum"), lit(0L)).as("p")).cache()
      val q = joined.stat.approxQuantile("p",
        Array(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0), 0.0)
      val nUrl = joined.count()
      val nHost = canon.select(col("dst_host")).distinct().count()
      val nRolled = roll.count()
      println(s"== $d  urls=$nUrl hosts=$nHost rolledHosts=$nRolled")
      println("   p quantiles (0/5/25/50/75/95/100): " + q.mkString(", "))
      joined.unpersist(); roll.unpersist()
    }
    spark.stop()
  }
}
