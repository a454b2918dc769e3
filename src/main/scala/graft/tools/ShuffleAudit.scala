package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch instrumentation: measured shuffle volume per catalog query.
  *
  * SCALE.md argues each operator's shuffle SHAPE; this tool measures the
  * actual bytes so the argument is checkable — a query whose "one small
  * aggregate" reads gigabytes would stand out immediately. Sums
  * shuffle-read/shuffle-write bytes and spill across all tasks per query
  * (local mode: events are in-process and synchronous enough to attribute
  * by bracketing; a cluster version would tag jobs with
  * `spark.jobGroup`). Not product surface. Run:
  * `runMain graft.tools.ShuffleAudit /root/testdata/sf0.1 SHUFFLES.md`
  */
object ShuffleAudit {

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
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "SHUFFLES.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    def mb(b: Long): String = f"${b / 1048576.0}%.1f"

    val rows = SparkEntry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      acc.reset()
      val n = try fn(spark, d).count()
      catch { case e: Throwable =>
        System.err.println(s"[shuffles] $name failed: ${e.getMessage}"); -1L
      }
      spark.catalog.clearCache()
      // listener bus is async: let the tail of task-end events drain
      Thread.sleep(200)
      (name, n, acc.read, acc.written, acc.spilled)
    }

    val sb = new StringBuilder
    sb ++= s"# Measured shuffle volume per query ($d, local[$cpus])\n\n"
    sb ++= "Total shuffle bytes read/written (and disk spill) across all\n"
    sb ++= "tasks of one run of each bench query — produced by\n"
    sb ++= "`graft.tools.ShuffleAudit` (a TaskEnd listener), NOT estimates.\n"
    sb ++= "Sorted by shuffle read, descending.\n\n"
    sb ++= "| query | rows | shuffle read MiB | shuffle write MiB | spill MiB |\n"
    sb ++= "|---|---:|---:|---:|---:|\n"
    rows.sortBy(-_._3).foreach { case (name, n, r, w, s) =>
      sb ++= s"| $name | $n | ${mb(r)} | ${mb(w)} | ${mb(s)} |\n"
    }
    val totalR = rows.map(_._3).sum; val totalW = rows.map(_._4).sum
    sb ++= s"| **total** | | **${mb(totalR)}** | **${mb(totalW)}** | **${mb(rows.map(_._5).sum)}** |\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[shuffles] wrote $out (read ${mb(totalR)} MiB, write ${mb(totalW)} MiB)")
    spark.stop()
  }
}
