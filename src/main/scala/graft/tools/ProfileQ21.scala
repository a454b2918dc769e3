package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Scratch warm-vs-cold profiler for q21 (SCD merge): wall-clock plus the
  * JOB COUNT behind it (VERDICT r8 §next-4 — q21's latency is a fixed
  * multi-job floor, not data volume; the count is the thing to watch).
  * Not product surface. */
object ProfileQ21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
    })
    val d = args(0)
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200) // listener drain
      println(f"[prof] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get() - j0}")
      r
    }
    (1 to 3).foreach { i =>
      time(s"q21 run #$i") {
        graft.SparkEntry.queries("q21_scd_merge")(spark, d).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
