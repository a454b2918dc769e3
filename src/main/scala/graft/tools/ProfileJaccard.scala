package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch stage profiler for the prefix-filtered Jaccard pipeline
  * (q46/q55/q62). Not product surface; run with
  * `runMain graft.tools.ProfileJaccard /root/testdata/sf0.1`. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    for (round <- 1 to 3) {
      time(s"q46 shingle n=2 t=0.5 #$round") {
        Dedup.jaccardPairs(docs, threshold = 0.5, n = 2).count()
      }
      time(s"q55 words  n=1 t=0.5 #$round") {
        Dedup.jaccardPairs(docs, threshold = 0.5, n = 1).count()
      }
    }
    spark.stop()
  }
}
