package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local[32] is the bench contract (builder prompt); SPARK_GRAFT_CPUS
    // overrides for constrained boxes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // ~60 queries × 2 reps in ONE JVM: broadcast/shuffle blocks are only
      // reclaimed when the ContextCleaner sees their refs collected, and a
      // 128 GiB heap may never GC on its own — late queries then run 4-6×
      // slower under the accumulated block pressure (q56: 7.6s in the full
      // run vs 1.7s in isolation, measured). Default periodicGC is 30min —
      // longer than the whole bench.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up (standard JMH practice): run every bench query once
    // at the smallest SF so the timed pass measures the plan, not the JIT.
    // Codegen classes are cached by generated source, which depends only on
    // the plan/schema — identical across SFs — so one sf0.001 pass compiles
    // everything the sf0.1 run needs at ~1% of the data cost. Timed queries
    // still re-read their own parquet; nothing data-sized is cached.
    // Failure-tolerant: a bad warm-up must not mask the timed run.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // comma-separated name filter for local subset reruns (outlier triage);
    // the driver's full run leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val bench = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val warmedUp = new java.io.File(warmDir).isDirectory
    if (warmedUp) {
      val w0 = System.nanoTime()
      bench.foreach { case (name, fn) =>
        try fn(spark, warmDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
        }
        // operators persist() internally (Scd, Dedup, SurrogateKeys, …)
        // and callers can't unpersist a lazy plan's internals: without
        // clearing, ~60 warm-ups + ~60 timed runs accumulate storage
        // blocks in the single bench JVM and the GC pressure taxes the
        // tail of the run
        spark.catalog.clearCache()
      }
      System.err.println(f"[bench] warm-up pass ($warmDir): ${(System.nanoTime() - w0) / 1e9}%.1fs")
    } else {
      try {
        spark.range(100000).selectExpr("sum(id)").collect()
        spark.read.parquet(s"$sfDir/region.parquet").count()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
      }
    }
    // Each query is timed REPS times and the MINIMUM is reported —
    // standard interference control on a shared box (run-to-run swings of
    // 3× with zero code change were measured on this hardware; the min is
    // the run least polluted by GC/compaction/neighbor noise and is the
    // stablest cross-round comparator). The protocol is recorded in the
    // JSON ("reps"/"agg") per the round-3 methodology-visibility advice.
    // Failed queries report a NEGATIVE elapsed time so breakage is
    // visible in BENCH output instead of masquerading as a fast run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val results = bench.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        // failure floor: a query that throws during analysis in <5ms would
        // otherwise record -0.004, format to "-0.00" at 2dp, and parse as
        // -0.0 — which fails v<0 checks and masquerades as a fast success
        val elapsed = math.max((System.nanoTime() - t0) / 1e9, 0.01)
        // outside the timed section: drop this query's internal persists
        // and nudge the ContextCleaner (it reclaims broadcast and shuffle
        // blocks only after a driver GC proves the refs dead)
        spark.catalog.clearCache()
        System.gc()
        if (ok) elapsed else -elapsed
      }
      // any failed rep fails the query (negative time)
      name -> (if (times.forall(_ >= 0)) times.min else -times.map(math.abs).min)
    }
    // Hardware calibration: a fixed, data-independent workload (range →
    // xxhash64 → hash aggregate, all codegen'd) timed min-of-3. Rounds
    // run on whatever box the scheduler gives them — r8 measured the
    // SAME code uniformly ~2× slower than r6 on a slower-per-core host —
    // so cross-round query comparisons need this to separate "code got
    // slower" from "the machine did". Compare query_time/calib_sec
    // across rounds, not raw seconds.
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, cpus.toInt)
        .selectExpr("xxhash64(id) % 997 AS k")
        .groupBy("k").count().count()
      (System.nanoTime() - t0) / 1e9
    }.min
    // Timings at 2 decimals: sub-10ms digits are noise on this box, and the
    // driver's capture keeps only the TAIL (~2.9 KB) of the output — r3-r5
    // all lost the line's head to truncation ("parsed": null). At 2dp the
    // whole 84-query line is ~2.1 KB and fits the window whole. Locale is
    // pinned to ROOT: the f interpolator uses the default locale, and a
    // comma-decimal locale would emit invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the sf tag is only emitted unquoted when it is actually a number —
    // any other dir name would otherwise yield a bare word and a parse
    // failure (the exact failure mode this line exists to avoid)
    val sfRaw = sfDir.split('/').last.stripPrefix("sf")
    val sfTag = if (sfRaw.matches("""\d+(\.\d+)?""")) sfRaw
                else "\"" + sfRaw.replace("\"", "'") + "\""
    // "n_queries"/"only" and "value" print AFTER "queries" so a tail-
    // truncated capture still shows the headline total AND whether it came
    // from a subset run (a filtered total must not masquerade as a full
    // catalog run); reps/agg record the min-of-N interference protocol.
    // calib_sec sits in the TAIL section (after "queries") so the
    // driver's tail-truncated capture always retains it
    // cpus prints NEXT TO calib_sec: the calibration partition count (and
    // thus the number it produces) assumes this many cores — a cross-round
    // calib-normalized comparison is only valid between runs with
    // matching cpus (SCALE.md §cross-round comparability)
    val line = s"""{"metric":"total","sf":$sfTag,"reps":$reps,"agg":"min","queries":$qs,"n_queries":${results.size},"only":${only.isDefined},"cpus":$cpus,"calib_sec":${fmt(calib)},"value":${fmt(total)}}"""
    println(line)
    // belt-and-braces: the full metric JSON also lands in a file that no
    // capture window can truncate
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
