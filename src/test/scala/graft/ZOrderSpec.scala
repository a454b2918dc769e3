package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Properties of the Z-order layout (q150): interleave correctness against
  * a bit-twiddling reference, bucket-bound invariants, and the actual
  * pruning win — a written z-ordered layout answers a 2-D box predicate
  * touching measurably fewer files than a single-column sort, judged by
  * the same min/max overlap test parquet footer skipping performs. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference Morton interleave. */
  private def ref(xb: Long, yb: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((xb >> j) & 1L) << (2 * j + 1)) | (((yb >> j) & 1L) << (2 * j))
    }

  test("interleave matches the bit-twiddling reference on all 8-bit pairs") {
    val pairs = for (x <- 0L until 256L by 7L; y <- 0L until 256L by 11L)
      yield (x, y)
    val got = pairs.toDF("xb", "yb")
      .select($"xb", $"yb", ZOrder.interleave($"xb", $"yb", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 8), s"interleave($x, $y)")
    }
    // bijectivity on the sampled grid: no two pairs share a key
    assert(got.map(_._3).distinct.length == got.length)
  }

  test("withZKey buckets cover [0, 2^bits) and extremes map to the ends") {
    val df = (0L to 1000L).map(i => (i, 1000L - i)).toDF("x", "y")
    val z = ZOrder.withZKey(df, "x", "y", bits = 4)
    val (mnx, mxx) = z.agg(min($"xb"), max($"xb"))
      .as[(Long, Long)].head()
    assert(mnx == 0L && mxx == 15L)
    assert(z.filter($"zkey" < 0 || $"zkey" >= 256).count() == 0)
  }

  test("z-ordered layout prunes a 2-D box better than a single-column sort") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val z = ZOrder.withZKey(li, "l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeClustered(z, "zkey", s"$dir/zorder", nFiles = 16)
    ZOrder.writeClustered(z, "l_orderkey", s"$dir/linear", nFiles = 16)
    // A single box centered at the domain midpoint is Morton's known
    // worst case (it straddles the top-level quadrant split in both
    // dims), so judge the layout the way a workload does: every aligned
    // quarter-box of the 4×4 grid, summed. The x-sorted layout prunes on
    // x only (~1/4 of files per box, any y); z-order prunes on both.
    val (mnx, mxx, mny, mxy) = li
      .agg(min($"l_orderkey"), max($"l_orderkey"),
        min($"l_partkey"), max($"l_partkey"))
      .as[(Long, Long, Long, Long)].head()
    val boxes = for (qx <- 0 to 3; qy <- 0 to 3) yield (
      mnx + qx * (mxx - mnx + 1) / 4, mnx + (qx + 1) * (mxx - mnx + 1) / 4 - 1,
      mny + qy * (mxy - mny + 1) / 4, mny + (qy + 1) * (mxy - mny + 1) / 4 - 1)
    def stats(sub: String) = ZOrder.fileRangeStats(spark, s"$dir/$sub",
      Seq("l_orderkey", "l_partkey")).cache()
    def touched(st: org.apache.spark.sql.DataFrame): Long = boxes.map {
      case (xLo, xHi, yLo, yHi) =>
        ZOrder.filesTouched(st, "l_orderkey", xLo, xHi,
          "l_partkey", yLo, yHi)
    }.sum
    val (zf, lf) = (touched(stats("zorder")), touched(stats("linear")))
    // ≥25% fewer file reads even at this tiny scale (16 files of ~375
    // rows, sampled range boundaries); the sf0.1 profiler measures the
    // at-scale ratio (SCALE.md §layout)
    assert(zf * 4 <= lf * 3,
      s"zorder touched $zf file-reads over 16 boxes, linear $lf")
    // and a box answer itself is identical across layouts
    val (xLo, xHi, yLo, yHi) = boxes(5)
    def answer(sub: String): Long = spark.read.parquet(s"$dir/$sub")
      .filter($"l_orderkey".between(xLo, xHi) &&
        $"l_partkey".between(yLo, yHi)).count()
    assert(answer("zorder") == answer("linear"))
  }
}
