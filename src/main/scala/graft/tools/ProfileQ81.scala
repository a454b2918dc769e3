package graft.tools

import graft.functions.TextOps
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: where do q81's seconds go? Times each stage of the
  * PMI pipeline in isolation at sf0.1. Not product surface. */
object ProfileQ81 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[q81] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs (rows=$n)")
        spark.catalog.clearCache()
      }
    }

    val docs = Tables.documents(spark, d)
    time("scan only")(docs.count())
    time("words explode + uni agg")(
      docs.select(explode(TextOps.words($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1))).count())
    time("HOF shingles explode + bi agg")(
      docs.select(explode(TextOps.shingles($"text", 2)).as("bg"))
        .groupBy($"bg").agg(count(lit(1))).count())
    time("full q81")(
      SparkEntry.queries("q81_bigram_pmi")(spark, d).count())
    spark.stop()
  }
}
