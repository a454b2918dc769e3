package graft.tools

import graft.operators.ZOrder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: measure the Z-order layout's file-skipping win at sf0.1
  * (SCALE.md §layout). Writes lineitem (l_orderkey × l_partkey) twice —
  * z-ordered vs x-sorted — into the same file count, then prices every
  * aligned box of an 8×8 grid by the min/max overlap test footer pruning
  * performs, in file counts AND bytes (sum of touched file sizes, the
  * quantity an object store actually bills). Not product surface. */
object ProfileZOrder {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = graft.Tables.lineitem(spark, base)
      .select($"l_orderkey", $"l_partkey")
    val z = ZOrder.withHilbertKey(ZOrder.withZKey(li, "l_orderkey", "l_partkey"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeClustered(z, "zkey", s"$dir/zorder", nFiles)
    ZOrder.writeClustered(z, "hkey", s"$dir/hilbert", nFiles)
    ZOrder.writeClustered(z, "l_orderkey", s"$dir/linear", nFiles)

    val (mnx, mxx, mny, mxy) = li.agg(min($"l_orderkey"), max($"l_orderkey"),
      min($"l_partkey"), max($"l_partkey")).as[(Long, Long, Long, Long)].head()
    val g = 8
    val boxes = for (qx <- 0 until g; qy <- 0 until g) yield (
      mnx + qx * (mxx - mnx + 1) / g, mnx + (qx + 1) * (mxx - mnx + 1) / g - 1,
      mny + qy * (mxy - mny + 1) / g, mny + (qy + 1) * (mxy - mny + 1) / g - 1)

    def fileSizes(sub: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.toString -> st.getLen).toMap
    }

    def price(sub: String): (Long, Long, Long) = {
      val sizes = fileSizes(sub)
      val st = ZOrder.fileRangeStats(spark, s"$dir/$sub",
        Seq("l_orderkey", "l_partkey")).cache()
      st.count()
      val perBox = boxes.map { case (xLo, xHi, yLo, yHi) =>
        val touched = st.filter(
          col("l_orderkey_min") <= xHi && col("l_orderkey_max") >= xLo &&
          col("l_partkey_min") <= yHi && col("l_partkey_max") >= yLo)
          .select("file").as[String].collect()
        (touched.length.toLong,
          touched.map(f => sizes.find { case (k, _) => f.endsWith(
            k.substring(k.lastIndexOf('/'))) }.map(_._2).getOrElse(0L)).sum)
      }
      (perBox.map(_._1).sum, perBox.map(_._2).sum, sizes.values.sum)
    }

    val (zFiles, zBytes, total) = price("zorder")
    val (hFiles, hBytes, _) = price("hilbert")
    val (lFiles, lBytes, _) = price("linear")
    println(f"""{"tool":"zorder","sf_dir":"$base","n_files":$nFiles,"grid":$g,""" +
      f""""boxes":${boxes.size},"zorder_file_reads":$zFiles,""" +
      f""""hilbert_file_reads":$hFiles,"linear_file_reads":$lFiles,""" +
      f""""zorder_bytes":$zBytes,"hilbert_bytes":$hBytes,""" +
      f""""linear_bytes":$lBytes,"layout_bytes_total":$total,""" +
      f""""zorder_ratio":${lBytes.toDouble / zBytes}%.2f,""" +
      f""""hilbert_ratio":${lBytes.toDouble / hBytes}%.2f}""")
  }
}
