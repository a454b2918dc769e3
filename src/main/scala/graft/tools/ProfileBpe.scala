package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: the scale rehearsal of BPE merge training (q149). The claim —
  * "training is vocab-scaled, not corpus-scaled: only the initial word
  * count touches the corpus; every round runs over the distinct-word
  * table" — measured at two operating points:
  *
  *   base — sf0.1 documents (5k docs)
  *   x10  — ten id-shifted copies (50k docs, SAME word population → the
  *          distinct-word working set is IDENTICAL; expect round cost
  *          flat, only the one corpus pass scales)
  *
  * Reports wall + shuffle bytes (TaskEnd listener, not estimates) for
  * the full 10-round train at each point. Not product surface. */
object ProfileBpe {

  private class Acc extends SparkListener {
    @volatile var read = 0L
    @volatile var spilled = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        spilled += m.diskBytesSpilled
      }
    }
    def reset(): Unit = { read = 0L; spilled = 0L }
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

    val docs0 = graft.Tables.documents(spark, base).select("doc_id", "text")
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
    def docsX(n: Int): DataFrame =
      (0 until n).map(k => docs0.withColumn("doc_id",
        col("doc_id") + lit(k * maxId))).reduce(_.unionByName(_))

    def run(label: String, docs: DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      // warm once (scan caches, codegen), measure min of 2
      val walls = (1 to 2).map { _ =>
        acc.reset()
        val t0 = System.nanoTime()
        val n = graft.operators.Bpe.trainMerges(docs, 10).count()
        require(n == 10, s"expected 10 merges, got $n")
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"tool":"bpe","point":"$label","wall_sec":${walls.min}%.2f,""" +
        f""""shuffle_read_mb":${acc.read / 1048576.0}%.1f,""" +
        f""""spill_mb":${acc.spilled / 1048576.0}%.1f}""")
    }

    run("base_1x", docsX(1))
    run("corpus_10x", docsX(10))

    // serial vs batched at an equal merge budget: 12 merges as 12
    // serial rounds vs 3 rounds of batch width 4 — the q170 claim is
    // that wall scales with ROUNDS (apply+checkpoint steps), not with
    // merges, so batched should land near serial/4 + selection noise.
    def runEqualBudget(label: String,
                       train: DataFrame => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val walls = (1 to 2).map { _ =>
        acc.reset()
        val t0 = System.nanoTime()
        val n = train(docsX(1))
        require(n > 0, s"$label produced no merges")
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (w, n) = walls.minBy(_._1)
      println(f"""{"tool":"bpe","point":"$label","merges":$n,""" +
        f""""wall_sec":$w%.2f,""" +
        f""""shuffle_read_mb":${acc.read / 1048576.0}%.1f,""" +
        f""""spill_mb":${acc.spilled / 1048576.0}%.1f}""")
    }
    runEqualBudget("serial_12",
      d => graft.operators.Bpe.trainMerges(d, 12).count())
    runEqualBudget("batched_3x4",
      d => graft.operators.Bpe.trainMergesBatched(d, 3, 4).count())

    // ---- encode job-count independence (r14 verdict directive #1):
    // with the merge list broadcast and the per-word greedy pass
    // (Bpe.encodeWords), encoding the vocabulary is a CONSTANT number
    // of Spark jobs regardless of merge count; the r14 fold path ran
    // one vocab-sized job PER MERGE. Train once outside the measured
    // window, then count jobs + wall for the encode action alone at
    // 3 vs 12 merges, plus the fold reference at 12. ----
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val docs1 = docsX(1)
    val trained = graft.operators.Bpe.trainMergesSeq(docs1, 12)
      .map(m => (m._2, m._3))
    val vocab = docs1
      .select(explode(graft.functions.TextOps.words(col("text"))).as("w"))
      .distinct().localCheckpoint()
    def runEncode(label: String, body: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val samples = (1 to 2).map { _ =>
        jobs.set(0L)
        val t0 = System.nanoTime()
        val n = body
        require(n > 0, s"$label encoded nothing")
        ((System.nanoTime() - t0) / 1e9, jobs.get())
      }
      val (w, j) = samples.minBy(_._1)
      println(f"""{"tool":"bpe","point":"$label","wall_sec":$w%.2f,""" +
        s""""jobs":$j}""")
    }
    runEncode("encode_bcast_3m",
      graft.operators.Bpe.encodeWords(vocab, trained.take(3)).count())
    runEncode("encode_bcast_12m",
      graft.operators.Bpe.encodeWords(vocab, trained).count())
    runEncode("encode_fold_12m",
      graft.operators.Bpe.encodeByFold(vocab, trained).count())

    // ---- production merge count (r15 verdict directive #7): pin the
    // "<1 MB, O(1) jobs" claim at a 32k-entry merge table. Training 32k
    // real rounds is out of budget here, so the table is synthetic but
    // MATCH-HEAVY by construction: the 12 trained merges, then every
    // 1-char×1-char pair over the corpus alphabet (these all fire —
    // words collapse to 2-char symbols), then 2-char×1-char chains —
    // i.e. the expression's presence-guard cannot just skip everything;
    // it has to survive a realistic match density. Expect: jobs equal
    // to the 3/12-merge points (the broadcast-plan invariant), wall
    // bounded by the per-word scan, table well under 1 MB. ----
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)
    val p2 = for (a <- alphabet; b <- alphabet) yield (a, b)
    val p3 = for (a <- alphabet; b <- alphabet; c <- alphabet) yield (a + b, c)
    val synth32k = (trained ++ p2 ++ p3).take(32768)
    val approxKb = synth32k.map { case (l, r) => l.length + r.length + 16 }
      .sum / 1024
    println(s"""{"tool":"bpe","point":"merge_table_32k","entries":${synth32k.size},"approx_kb":$approxKb}""")
    runEncode("encode_32k",
      graft.operators.Bpe.encodeWords(vocab, synth32k).count())
  }
}
