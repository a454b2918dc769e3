package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: incremental LSH cost vs batch fraction — the q126 claim is
  * cost ∝ batch (registry stored); measure small-batch speedup against
  * the full q56 run. Not product surface. */
object ProfileQ126 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.operators.Dedup
    import graft.functions.{NGramHash64, TextOps => _}
    val docs = graft.Tables.documents(spark, d)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      time("full minhashCandidates") {
        Dedup.minhashCandidates(docs, 0.8).count()
      }
      // production shape: registry PERSISTED (landed between batches),
      // batch ≈ 1% of the corpus
      val batch = docs.filter(col("doc_id") % 97 === 0)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      val registry = Dedup.minhashBandRegistry(corpus).localCheckpoint()
      val sets = docs.select(col("doc_id"),
        NGramHash64.ngramHashes(
          graft.functions.TextOps.words(col("text")), 1).as("wset"))
        .localCheckpoint()
      time("incremental, 1% batch (stored registry)") {
        Dedup.minhashCandidatesIncremental(registry, sets, batch, 0.8).count()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
