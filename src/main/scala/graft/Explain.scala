package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints `explain("formatted")` for the named
  * catalog queries (all of them when no args). Used per-round to check
  * the plans we promise — pushdown reaching the scans, pruned
  * ReadSchema, broadcast joins on dims, wide WholeStageCodegen spans.
  *
  * Usage: `sbt "runMain graft.Explain q03_star_join q22_fact_build"`
  * (env `SPARK_GRAFT_SF_DIR` to point at a scale dir).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"\n===== $q =====")
      try SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"  failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
