package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: the sf1 SCALE REHEARSAL of the flagship warehouse build
  * (VERDICT r10 §next-5). All q103 scale arguments extrapolate from
  * sf0.1; this runs the identical pipeline at 10× the staged rows and
  * measures wall / shuffle / spill so "every exchange linear in staged
  * bytes" is checked against data, not argued.
  *
  * sf1 input: IbrdScale derives every value from
  * `i = l_orderkey·8 + l_linenumber`, so a faithful 10× input is ten
  * id-shifted copies of the sf0.1 lineitem key pair (same per-order line
  * structure, disjoint i ranges) — written once to a temp dir that
  * Tables.lineitem reads like any sf dir. Not product surface. */
object ProfileQ103Sf1 {

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

    // ---- synthesize the sf1 lineitem key pairs: 10 shifted copies ----
    val sf1dir = java.nio.file.Files.createTempDirectory("graft_sf1").toString
    val li = graft.Tables.lineitem(spark, base)
      .select(col("l_orderkey"), col("l_linenumber"))
    val maxOrd = li.agg(max(col("l_orderkey"))).head.getLong(0) + 1
    (0 until 10).map(k => li.select(
        (col("l_orderkey") + lit(k * maxOrd)).as("l_orderkey"),
        col("l_linenumber")))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$sf1dir/lineitem.parquet")
    println(s"[prof] sf1 lineitem rows: " +
      spark.read.parquet(s"$sf1dir/lineitem.parquet").count())

    def run(label: String, dir: String): Unit = {
      spark.catalog.clearCache(); System.gc()
      acc.reset()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q103_ibrd_scaled_build")(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // local-mode listener events are near-synchronous; settle briefly
      Thread.sleep(500)
      println(f"[prof] $label%-8s rows=$n wall=$wall%.2f s " +
        f"shuffle_read=${acc.read / 1048576.0}%.1f MiB " +
        f"shuffle_write=${acc.written / 1048576.0}%.1f MiB " +
        f"spill=${acc.spilled / 1048576.0}%.1f MiB")
    }
    run("warmup", "/root/testdata/sf0.01") // JIT/codegen, tiny data
    run("sf0.1", base)
    run("sf1", sf1dir)
    spark.stop()
  }
}
