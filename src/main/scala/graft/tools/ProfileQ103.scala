package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch phase profiler for q103 (sf-scaled IBRD build): wall-clock +
  * job count per pipeline phase — staging checkpoint, per-dim SCD loads,
  * fact assembly, visual. Not product surface. */
object ProfileQ103 {
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
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200) // listener drain
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get() - j0}")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val staged = time("clean+checkpoint") {
        graft.ibrd.Clean.stage(graft.ibrd.IbrdScale.rawScaled(spark, d))
          .localCheckpoint()
      }
      val star = time("build (dims)") {
        graft.ibrd.IbrdWarehouse.build(spark, staged)
      }
      time("fact count") { star.fact.count() }
      time("visual") {
        graft.ibrd.IbrdMeasures.loansByStatus(star).collect()
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
