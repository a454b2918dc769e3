package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: the scale rehearsal of the media-registry knockout (q144,
  * the ProfileDedupSf1 recipe for the multimodal tier). The claim —
  * "per-batch cost ∝ batch, never the corpus: the registry streams
  * through a broadcast knockout" — measured at three operating points:
  *
  *   base  — sf0.1 registry + sf0.1 batch
  *   sf1   — 10× registry + 10× batch      (expect ≈10×: linear)
  *   fixed — 10× registry + sf0.1 batch    (expect ≈base: the money row
  *           MINUS the registry scan itself, which IS corpus-sized but
  *           sequential and column-pruned — the point is no exchange
  *           and no per-batch re-decode of the corpus)
  *
  * 10× synthesis: ten id-shifted document copies. Clip content derives
  * from seed = doc_id/3, so shifted ids are NEW virtual recordings —
  * ten disjoint shards, each isomorphic to sf0.1 (the composition a
  * 10× crawl actually has). Registries land as parquet first (build is
  * the one-time ingest side, priced separately); the timed step is the
  * batch's decode + broadcast knockout + coverage routing, exactly the
  * per-batch work of the ingest loop. Not product surface. */
object ProfileMediaDedup {

  private class Acc extends SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    @volatile var spilled = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        written += m.shuffleWriteMetrics.bytesWritten
        spilled += m.diskBytesSpilled
      }
    }
    def reset(): Unit = { read = 0L; written = 0L; spilled = 0L }
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    import graft.operators.Multimodal
    import graft.multimodal.Binary

    val docs0 = graft.Tables.documents(spark, base).select("doc_id")
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
    def docsX(n: Int): DataFrame =
      (0 until n).map(k => docs0.withColumn("doc_id", col("doc_id") + lit(k * maxId)))
        .reduce(_.unionByName(_))

    def landRegistry(d: DataFrame, tag: String): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_media_reg_$tag").toString
      Multimodal.videoPrintRegistry(
          Binary.syntheticAviClips(d.filter(col("doc_id") % 4 =!= 3)))
        .write.mode("overwrite").parquet(s"$dir/registry")
      s"$dir/registry"
    }

    def run(label: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      acc.reset()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[prof] $label%-18s rows=$n%-8d wall=$wall%.2f s " +
        f"shuffle_read=${acc.read / 1048576.0}%.1f MiB " +
        f"shuffle_write=${acc.written / 1048576.0}%.1f MiB " +
        f"spill=${acc.spilled / 1048576.0}%.1f MiB")
    }

    def knockout(regPath: String, d: DataFrame): Long =
      Multimodal.videoDedupIncremental(
        spark.read.parquet(regPath),
        Binary.syntheticAviClips(d.filter(col("doc_id") % 4 === 3)),
        dropAt = 0.5).count()

    // warm-up compiles every codegen class at tiny scale
    {
      val w = docs0.limit(100)
      val r = landRegistry(w, "warm")
      knockout(r, w)
      ()
    }

    val reg1 = landRegistry(docs0, "1x")
    val reg10 = landRegistry(docsX(10), "10x")
    run("base (reg1x,b1x)")(knockout(reg1, docs0))
    run("sf1 (reg10x,b10x)")(knockout(reg10, docsX(10)))
    run("fixed (reg10x,b1x)")(knockout(reg10, docs0))
    spark.stop()
  }
}
