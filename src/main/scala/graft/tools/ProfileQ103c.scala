package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: full-width staged compute vs localCheckpoint store cost. */
object ProfileQ103c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val staged = graft.ibrd.Clean.stage(graft.ibrd.IbrdScale.rawScaled(spark, d))
      time("full-width noop write") {
        staged.write.format("noop").mode("overwrite").save()
      }
      time("localCheckpoint") { staged.localCheckpoint() }
      time("persist(SER)+count") {
        val p = staged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        p.count(); p.unpersist(blocking = true)
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
