package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the q98 watch item (VERDICT r9 §next-4): wall
  * clock, job count and measured shuffle-write bytes for
  * q98_paragraph_dedup and its hash-keyed twin q99, min-of-N in
  * isolation — the triage the verify skill prescribes before bisecting
  * code (bench-tail numbers lie under block pressure). Not product
  * surface. */
object ProfileQ98 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def run(name: String): Unit = {
      val times = (1 to 4).map { i =>
        val j0 = jobs.get(); val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[prof] $name%-28s run#$i ${dt}%.2f s jobs=${jobs.get() - j0} " +
          f"shuffleMiB=${(shuffleBytes.get() - b0) / 1024.0 / 1024.0}%.1f")
        spark.catalog.clearCache(); System.gc()
        dt
      }
      println(f"[prof] $name%-28s min=${times.min}%.2f s")
    }
    // calibration (Bench's fixed workload) so cross-round compares normalize
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("xxhash64(id) % 997 AS k").groupBy("k").count().count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[prof] calib_sec=$calib%.2f")
    run("q98_paragraph_dedup")
    run("q99_paragraph_dedup_hashed")
    spark.stop()
  }
}
