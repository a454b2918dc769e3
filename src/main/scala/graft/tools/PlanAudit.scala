package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** Scratch plan linter over the whole catalog — flags the two 100 TB
  * anti-patterns that hide in green queries: un-partitioned windows
  * (single-partition collapse) and broadcasts of non-dimension inputs.
  * Not part of the product surface; run with
  * `runMain graft.tools.PlanAudit /root/testdata/sf0.001`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    // full traversal incl. materialized AQE query stages (see PlanWalk)
    def walk(p: SparkPlan): Seq[SparkPlan] = graft.plans.PlanWalk.walk(p)

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        // df.collect() executes df's OWN QueryExecution — df.count() would
        // build and run a separate derived plan, leaving this one's
        // AdaptiveSparkPlanExec un-finalized and every BroadcastExchange
        // dataSize metric unpopulated (the LARGE BROADCAST check would be
        // dead code). Data is sf0.001-sized, so collect is cheap.
        df.collect()
        val nodes = walk(df.queryExecution.executedPlan)
        nodes.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            println(s"[audit] $name: UNPARTITIONED WINDOW ${w.windowExpression.mkString(",").take(80)}")
          case b: BroadcastExchangeExec =>
            // dataSize for a hashed relation has a ~64 MiB allocation
            // floor (preallocated map pages) even for a 5-row dim, so
            // bytes alone false-positives on every broadcast; require a
            // row count that can't be a dim/aggregate to call it large
            val bytes = b.metrics.get("dataSize").map(_.value).getOrElse(-1L)
            val rows = b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
            if (bytes > 128L * 1024 * 1024 || rows > 1000000L)
              println(s"[audit] $name: LARGE BROADCAST ~${bytes / 1024 / 1024} MiB ($rows rows)")
          case _ =>
        }
      } catch {
        case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage.take(120)}")
      }
    }
    println("[audit] done")
    spark.stop()
  }
}
