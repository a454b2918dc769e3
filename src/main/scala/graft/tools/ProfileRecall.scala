package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: ANN recall vs brute force at an arbitrary SF (the LlmOpsSpec
  * property runs at the fast test SF; this checks the same property at
  * bench scale). Not product surface. */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val emb = Tables.embeddings(spark, d)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5))
    val ann = pairs(Similarity.annTopK(emb.filter(col("vec_id") < 10), emb, 5,
      Similarity.SignBits))
    val ivf = pairs(Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, 5,
      Similarity.IvfCentroids, Similarity.IvfProbes))
    println(s"[recall] n=${emb.count()} cells=${1 << Similarity.SignBits}")
    println(f"[recall] sign-lsh multi-probe: ${(bf & ann).size.toDouble / bf.size}%.3f")
    println(f"[recall] ivf ${Similarity.IvfCentroids}x${Similarity.IvfProbes}-probe: ${(bf & ivf).size.toDouble / bf.size}%.3f")
    spark.stop()
  }
}
