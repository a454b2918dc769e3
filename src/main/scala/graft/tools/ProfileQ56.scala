package graft.tools

import graft.functions.TextOps
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the MinHash+LSH pipeline (q56).
  * Not part of the product surface; run with
  * `runMain graft.tools.ProfileQ56 /root/testdata/sf0.1`. */
object ProfileQ56 {
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
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    docs.count() // warm the scan

    val banded = docs.select(col("doc_id"), col("lang"),
      explode(TextOps.lshBands(
        TextOps.minhashSignature(col("text"), n = 1, k = 96),
        bands = 12, rowsPer = 8)).as("band"))
    val a = banded.select(col("doc_id").as("a_id"), col("lang"), col("band"))
    val b = banded.select(col("doc_id").as("b_id"), col("lang"), col("band"))
    val candIds = a.join(b, Seq("lang", "band"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val sets = docs.select(col("doc_id"),
      array_sort(transform(TextOps.distinctWords(col("text")), w => xxhash64(w)))
        .as("wset"))

    (1 to 2).foreach { i =>
      time(s"pair-gen+dedup #$i") { candIds.count() }
    }
    (1 to 2).foreach { i =>
      time(s"hashed sets only #$i") { sets.agg(count(lit(1))).collect() }
    }
    (1 to 2).foreach { i =>
      time(s"verify (hashed, hinted) #$i") {
        candIds
          .join(sets.toDF("a_id", "a_set").hint("SHUFFLE_HASH"), "a_id")
          .join(sets.toDF("b_id", "b_set").hint("SHUFFLE_HASH"), "b_id")
          .withColumn("inter", size(array_intersect(col("a_set"), col("b_set"))))
          .withColumn("jaccard", col("inter").cast("double") /
            (size(col("a_set")) + size(col("b_set")) - col("inter")))
          .filter(col("jaccard") >= 0.8).count()
      }
    }
    (1 to 3).foreach { i =>
      time(s"full operator #$i") {
        graft.operators.Dedup.minhashCandidates(docs, 0.8).count()
      }
    }
    spark.stop()
  }
}
