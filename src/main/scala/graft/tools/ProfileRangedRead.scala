package graft.tools

import graft.multimodal.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measured bytes-read comparison of the by-reference video
  * decode paths (VERDICT r12 §next-2 — the numbers behind SCALE.md's
  * "cost ∝ sampled frames end-to-end" claim).
  *
  * Packs the sf corpus's AVI containers into Hadoop-FS pack files
  * ([[Binary.writeAssetRefs]]) and compares, per sampling stride, the
  * bytes the ranged reader actually fetches (headers + idx1 + sampled
  * frame ranges — counted by the reader itself, not estimated) against
  * the full-container byte total an in-cell/whole-object read pays.
  * Also wall-clocks the by-ref path vs the in-cell q139 path on the
  * same assets. The synthetic containers are SMALL (tens of frames,
  * ~KB), which UNDERSTATES the ranged win — headers + idx1 are a fixed
  * cost per asset that real hour-long containers amortize to nothing;
  * the per-stride frame-byte column is the scale-invariant signal.
  * Not product surface. */
object ProfileRangedRead {

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, d)
    val assets = Binary.syntheticAviAssets(docs)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ranged_prof").toString
    val t0 = System.nanoTime()
    val refs = Binary.writeAssetRefs(assets, dir).cache()
    val nAssets = refs.count()
    val packSec = (System.nanoTime() - t0) / 1e9
    val totalBytes = refs.agg(sum(col("length"))).head.getLong(0)
    println(f"[ranged] $nAssets%d assets packed, " +
      f"full-container total ${totalBytes / 1024.0}%.1f KiB " +
      f"(pack write $packSec%.2f s)")

    def time[T](body: => T): (T, Double) = {
      val t = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t) / 1e9)
    }
    Seq(1, 2, 4, 8).foreach { every =>
      val acc = spark.sparkContext.longAccumulator(s"ranged_e$every")
      val (rows, sec) = time {
        Binary.videoFrameSampleStatsByRef(refs, every, Some(acc)).count()
      }
      val (_, cellSec) = time {
        Binary.videoFrameSampleStats(assets, every).count()
      }
      println(f"[ranged] every=$every%d: $rows%d frames, " +
        f"ranged ${acc.value / 1024.0}%.1f KiB " +
        f"(${100.0 * acc.value / totalBytes}%.1f%% of full), " +
        f"byref $sec%.2f s vs in-cell $cellSec%.2f s")
    }
    spark.stop()
  }
}
