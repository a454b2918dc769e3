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

  test("hilbertRef is a true Hilbert curve: bijective and CONTINUOUS on the full 8-bit grid") {
    // ground truth for everything else: index all 65536 grid points,
    // then walking the curve in d-order must visit each exactly once
    // (bijection) stepping to a 4-neighbor every time (continuity) —
    // the property Morton lacks and the reason q152 exists
    val pts = Array.ofDim[(Long, Long)](65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = ZOrder.hilbertRef(8, x, y)
      assert(d >= 0 && d < 65536, s"d($x,$y)=$d out of range")
      assert(pts(d.toInt) == null, s"d=$d hit twice")
      pts(d.toInt) = (x.toLong, y.toLong)
    }
    for (d <- 0 until 65535) {
      val (x1, y1) = pts(d); val (x2, y2) = pts(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps at d=$d: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("withHilbertKey matches the reference walk on a sampled 8-bit grid") {
    val pairs = for (x <- 0L until 256L by 7L; y <- 0L until 256L by 11L)
      yield (x, y)
    val got = ZOrder.withHilbertKey(pairs.toDF("xb", "yb"))
      .select($"xb", $"yb", $"hkey").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == ZOrder.hilbertRef(8, x, y), s"hilbert($x, $y)")
    }
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
