package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment (VERDICT r7 §next-5, extended to 8× by r8 §next-5):
  * does q46's candidate-verify shuffle grow LINEARLY in corpus size, or
  * super-linearly? Measures actual shuffle read/write bytes (TaskEnd
  * listener, not estimates) for `jaccardPairs(documents, 0.5, n = 2)`,
  * against each corpus's text bytes as the linearity denominator.
  *
  * Inputs are either sf dirs or `xN` multipliers of the sf0.1 corpus.
  * An `xN` corpus is the real corpus plus N−1 deterministic syntheses:
  * copy k permutes each document's words by sorting on
  * `xxhash64(word, k, pos)` — the per-document unigram multiset (and so
  * every word's df) scales EXACTLY ×N, which is the mechanism behind the
  * super-linear growth (prefixes widen as dfs grow), while the 2-gram
  * shingle sets of different copies share almost nothing, so the
  * synthesis does not manufacture cross-copy near-dup pairs. Synthesized
  * corpora are materialized to parquet first so the measured run is the
  * operator alone. Not product surface. Run:
  * `runMain graft.tools.ProfileQ46Scale x1 x2 x4 x8`
  * `runMain graft.tools.ProfileQ46Scale /root/testdata/sf0.001 /root/testdata/sf0.01`
  */
object ProfileQ46Scale {

  private class Acc extends SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        written += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = { read = 0L; written = 0L }
  }

  /** Real corpus ∪ (n−1) word-permuted copies, ids offset per copy. */
  private def synth(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      if (k == 0) docs.select(col("doc_id"), col("lang"), col("source"), col("text"))
      else docs.select(
        (col("doc_id") + k * 10000000L).as("doc_id"),
        col("lang"), col("source"),
        array_join(transform(array_sort(zip_with(
          split(col("text"), " "),
          sequence(lit(0), greatest(size(split(col("text"), " ")) - 1, lit(0))),
          (w, p) => struct(xxhash64(w, lit(k), p).as("h"), w.as("w")))),
          e => e.getField("w")), " ").as("text"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val specs = if (args.nonEmpty) args.toSeq
    else Seq("x1", "x2", "x4", "x8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    println(f"${"corpus"}%-28s ${"docs"}%8s ${"textMiB"}%8s ${"pairs"}%8s " +
      f"${"readMiB"}%8s ${"writeMiB"}%9s ${"read/text"}%9s")
    specs.foreach { spec =>
      val docs = if (spec.startsWith("x")) {
        val n = spec.stripPrefix("x").toInt
        val path = s"/tmp/q46scale_$spec.parquet"
        if (!new java.io.File(path).exists())
          synth(Tables.documents(spark, "/root/testdata/sf0.1"), n)
            .write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      } else Tables.documents(spark, spec)
      val nDocs = docs.count()
      val textBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
      // warm-up (codegen, file listing) so the measured run is the plan
      Dedup.jaccardPairs(docs, threshold = 0.5, n = 2).count()
      Thread.sleep(300)
      acc.reset()
      val pairs = Dedup.jaccardPairs(docs, threshold = 0.5, n = 2).count()
      Thread.sleep(300) // listener bus drain
      val (r, w) = (acc.read, acc.written)
      println(f"$spec%-28s $nDocs%8d ${textBytes / 1048576.0}%8.2f $pairs%8d " +
        f"${r / 1048576.0}%8.2f ${w / 1048576.0}%9.2f ${r.toDouble / textBytes}%9.2f")
    }
    spark.stop()
  }
}
