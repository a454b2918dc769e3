package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch sub-phase profiler for q103's staging landing + fact window
  * (VERDICT r9 §next-6 triage). Not product surface. */
object ProfileQ103b {
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
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0}")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val raw = graft.ibrd.IbrdScale.rawScaled(spark, d)
      time("raw count") { raw.count() }
      val staged = graft.ibrd.Clean.stage(raw)
      time("stage compute (count)") { staged.count() }
      val landed = time("stage localCheckpoint") { staged.localCheckpoint() }
      val factIn = landed.filter(
        col("country_BK").isNotNull && col("borrower_BK").isNotNull &&
          col("guarantor_BK").isNotNull && col("loan_status_BK").isNotNull &&
          col("loan_type_BK").isNotNull && col("region_BK").isNotNull)
      time("rangebuckets sample") {
        graft.warehouse.RangeBuckets.pidExpr(factIn,
          Seq("loan_number", "end_of_period"), 32)
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
