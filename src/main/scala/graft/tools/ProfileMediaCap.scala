package graft.tools

import graft.multimodal.Binary
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType,
  StructField, StructType}

/** Scratch: the capped-vs-uncapped measurement behind the media
  * near-dup bucket cap (VERDICT r12 §next-1 — SCALE.md's numbers).
  *
  * The adversarial shape a planted-similarity generator never makes:
  * ONE fingerprint shared by k assets (a black frame — ubiquitous on a
  * real video corpus) detonates the bucket→pairs stage into k²/2 rows.
  * Corpus: `hot` assets share a black frame + carry 2 unique frames;
  * 50 planted true pairs (2 shared frames of 4) sit in 2-member
  * buckets. Measures wall + shuffled rows for the q141 pipeline with
  * the cap below k vs effectively uncapped — same output above the
  * 0.25 threshold either way (hot-only pairs sit at J=1/5), so the
  * delta is pure detonation cost. Not product surface. */
object ProfileMediaCap {

  private class Acc extends SparkListener {
    @volatile var records = 0L
    @volatile var bytes = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        records += m.shuffleWriteMetrics.recordsWritten
        bytes += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = { records = 0L; bytes = 0L }
  }

  def main(args: Array[String]): Unit = {
    val hot = if (args.nonEmpty) args(0).toInt else 2000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    // injective for cid < 2^24 — distinct frame ids, distinct prints
    def colorFrame(cid: Int): (Int, Int, Int) => Int =
      (_, _, _) => ((cid % 256) << 16) | (((cid / 256) % 256) << 8) |
        ((cid / 65536) % 256)
    def asset(frameIds: Seq[Int]): Array[Byte] =
      Binary.Avi.encode(8, 4, frameIds.size,
        (f, x, y) => colorFrame(frameIds(f))(x, y, 0))
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows =
      (0 until hot).map(i =>
        Row(i.toLong, "video/avi", asset(Seq(0, 10 + i * 4 + 1, 10 + i * 4 + 2)))) ++
      (0 until 50).flatMap { j =>
        val b = 10 * hot + j * 10
        Seq(Row((hot + 2 * j).toLong, "video/avi", asset(Seq(b, b + 1, b + 2))),
            Row((hot + 2 * j + 1).toLong, "video/avi",
              asset(Seq(b + 1, b + 2, b + 3))))
      }
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 32), schema).cache()
    corpus.count()

    def run(label: String, cap: Int): Unit = {
      // warm once, then measure (the q141 pipeline end to end)
      graft.operators.Multimodal.videoNearDup(corpus, 0.25, cap).count()
      acc.reset()
      val t0 = System.nanoTime()
      val n = graft.operators.Multimodal.videoNearDup(corpus, 0.25, cap).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async listener bus
      println(f"[mediacap] $label: $n%d pairs out, $sec%.2f s, " +
        f"${acc.records}%d shuffled rows (${acc.bytes / 1048576.0}%.1f MiB)")
    }
    println(s"[mediacap] corpus: $hot hot assets sharing one black frame " +
      s"+ 50 planted pairs; uncapped hot bucket = ${hot.toLong * (hot - 1) / 2} pairs")
    run(s"capped (maxBucket=1000 < $hot)", 1000)
    run("uncapped (maxBucket=2^30)", 1 << 30)
    spark.stop()
  }
}
