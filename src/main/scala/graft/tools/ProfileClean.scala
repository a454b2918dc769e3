package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch decomposition of q103's staging slice (the biggest phase in
  * ProfileQ103): times raw generation, the projection-only prefix, the
  * filled stage, and the keyed landing separately via the noop sink.
  * Not product surface. */
object ProfileClean {
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
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      time("lineitem count") {
        graft.Tables.lineitem(spark, d).count()
      }
      time("rawScaled noop") {
        noop(graft.ibrd.IbrdScale.rawScaled(spark, d))
      }
      time("stageNoFill noop") {
        noop(graft.ibrd.Clean.stageNoFill(graft.ibrd.IbrdScale.rawScaled(spark, d)))
      }
      time("stage (fill) noop") {
        noop(graft.ibrd.Clean.stage(graft.ibrd.IbrdScale.rawScaled(spark, d)))
      }
      time("stageKeyed landing") {
        val (staged, _, _) = graft.ibrd.Clean.stageKeyed(
          graft.ibrd.IbrdScale.rawScaled(spark, d))
        staged.localCheckpoint().count()
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
