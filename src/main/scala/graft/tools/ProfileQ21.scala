package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch warm-vs-cold profiler for q21 (SCD merge). Not product surface. */
object ProfileQ21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      time(s"q21 run #$i") {
        graft.SparkEntry.queries("q21_scd_merge")(spark, d).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
