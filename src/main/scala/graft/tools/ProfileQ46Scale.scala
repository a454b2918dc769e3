package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length, sum}

/** Scratch experiment (VERDICT r7 §next-5): does q46's candidate-verify
  * shuffle grow LINEARLY in corpus size, or super-linearly? Measures
  * actual shuffle read/write bytes (TaskEnd listener, not estimates) for
  * `jaccardPairs(documents, 0.5, n=2)` across every scale factor given,
  * against each corpus's text bytes as the linearity denominator. Not
  * product surface. Run:
  * `runMain graft.tools.ProfileQ46Scale /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1`
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

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
    else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
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

    println(f"${"sfDir"}%-28s ${"docs"}%8s ${"textMiB"}%8s ${"pairs"}%8s " +
      f"${"readMiB"}%8s ${"writeMiB"}%9s ${"read/text"}%9s")
    dirs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val nDocs = docs.count()
      val textBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
      // warm-up (codegen, file listing) so the measured run is the plan
      Dedup.jaccardPairs(docs, threshold = 0.5, n = 2).count()
      Thread.sleep(300)
      acc.reset()
      val pairs = Dedup.jaccardPairs(docs, threshold = 0.5, n = 2).count()
      Thread.sleep(300) // listener bus drain
      val (r, w) = (acc.read, acc.written)
      println(f"$d%-28s $nDocs%8d ${textBytes / 1048576.0}%8.2f $pairs%8d " +
        f"${r / 1048576.0}%8.2f ${w / 1048576.0}%9.2f ${r.toDouble / textBytes}%9.2f")
    }
    spark.stop()
  }
}
