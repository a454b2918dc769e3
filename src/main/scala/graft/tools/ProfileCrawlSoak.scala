package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: the crawl-loop SOAK profile (VERDICT r11 §next-6). q130's
  * bench form is a 4×25% drive; the 100 TB operating point is many
  * SMALL batches over many compaction cycles. Drive 16 ~6% batches with
  * `compactEvery = 4` at sf0.1 and print each batch's wall, shuffle and
  * registry-file census so SCALE.md's steady-state per-batch cost table
  * is measured, not argued. Flatness reads directly off the output: the
  * per-batch wall must not creep across cycles (append-file
  * accumulation between compactions is bounded by construction — the
  * in-suite StreamingSpec soak asserts the census and the no-exchange
  * knockout plan at every cycle; this tool prices the same drive).
  * Compaction batches (every 4th) are reported separately: their extra
  * cost is the registry consolidation, the loop's one registry-sized
  * job per cycle. Not product surface. */
object ProfileCrawlSoak {

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
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.operators.{Crawl, Similarity}

    // SPARK_GRAFT_SYN10X=1: drive the loop over a faithful 10× corpus
    // (ProfileDedupSf1's synthesis — ten id-shifted copies with every
    // word of copy k>0 suffixed `_k`, so each shard is isomorphic to
    // sf0.1 and cross-shard similarity is zero; embeddings id-shifted
    // alongside so the assignment join covers every kept doc). The sf1
    // datapoint for the COMPOSED loop: per-batch wall must scale with
    // the ~10× batch size and stay flat across cycles, zero spill.
    val syn10x = sys.env.get("SPARK_GRAFT_SYN10X").contains("1")
    val (docs, emb) = if (!syn10x) {
      (graft.Tables.documents(spark, d), graft.Tables.embeddings(spark, d))
    } else {
      val synDir = java.nio.file.Files.createTempDirectory("graft_soak_syn").toString
      val docs0 = graft.Tables.documents(spark, d)
      val emb0 = graft.Tables.embeddings(spark, d)
      val maxId = docs0.agg(max(col("doc_id"))).head.getLong(0) + 1
      (0 until 10).map { k =>
        val text =
          if (k == 0) col("text")
          else when(col("text").isNull, lit(null).cast("string"))
            .otherwise(array_join(
              transform(split(col("text"), " "), w => concat(w, lit(s"_$k"))),
              " "))
        docs0.select((col("doc_id") + lit(k * maxId)).as("doc_id"),
          text.as("text"), col("lang"), col("source"))
          .withColumn("n_chars", length(coalesce(col("text"), lit(""))))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$synDir/documents.parquet")
      (0 until 10).map { k =>
        emb0.withColumn("vec_id", col("vec_id") + lit(k * maxId))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$synDir/embeddings.parquet")
      (graft.Tables.documents(spark, synDir),
        graft.Tables.embeddings(spark, synDir))
    }
    val codebook = emb.filter(col("vec_id") < Similarity.IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
    val hi = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val nBatches = 16
    val compactEvery = 4

    // warm-up drive at sf0.01 (codegen/JIT — same plans, ~1% data)
    {
      val wd = "/root/testdata/sf0.01"
      val wdocs = graft.Tables.documents(spark, wd)
      val wemb = graft.Tables.embeddings(spark, wd)
      val wcb = wemb.filter(col("vec_id") < Similarity.IvfCentroids)
        .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
      val whi = wdocs.agg(max(col("doc_id"))).head.getLong(0) + 1
      val wroot = java.nio.file.Files.createTempDirectory("graft_soakw").toString
      val wloop = new Crawl.Loop(spark, wcb, wemb, wroot, tag = "soakw",
        compactEvery = compactEvery, buckets = 8, template = wdocs.schema)
      (0 until 4).foreach { k =>
        wloop.ingest(wdocs.filter(col("doc_id") >= whi * k / 4 &&
          col("doc_id") < (if (k == 3) whi else whi * (k + 1) / 4)), k)
      }
      spark.catalog.clearCache(); System.gc()
    }

    // SPARK_GRAFT_MEDIA=1: every batch also carries its documents' video
    // clips (the r13 composed-media members) — prices what the media
    // knockout + print-registry append add per batch over the text loop
    val withMedia = sys.env.get("SPARK_GRAFT_MEDIA").contains("1")
    val root = java.nio.file.Files.createTempDirectory("graft_soak_prof").toString
    val loop = new Crawl.Loop(spark, codebook, emb, root, tag = "soak_prof",
      compactEvery = compactEvery, buckets = 32, template = docs.schema)
    val walls = (0 until nBatches).map { k =>
      val lo = hi * k / nBatches
      val up = if (k == nBatches - 1) hi else hi * (k + 1) / nBatches
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < up)
      val media = if (withMedia)
        Some(graft.multimodal.Binary.syntheticAviClips(batch)) else None
      acc.reset()
      val t0 = System.nanoTime()
      loop.ingest(batch, k, media)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val census = loop.state().seen.inputFiles.length
      val tag = if ((k + 1) % compactEvery == 0) "compact" else ""
      println(f"[prof] batch $k%-3d wall=$wall%.2f s " +
        f"shuffle_w=${acc.written / 1048576.0}%.1f MiB " +
        f"spill=${acc.spilled / 1048576.0}%.1f MiB seen_files=$census%-4d $tag")
      spark.catalog.clearCache(); System.gc()
      (wall, tag.nonEmpty)
    }
    val plain = walls.collect { case (w, false) => w }
    val compacts = walls.collect { case (w, true) => w }
    // flatness summary: first vs last compaction cycle's plain batches
    val firstCycle = plain.take(compactEvery - 1)
    val lastCycle = plain.takeRight(compactEvery - 1)
    println(f"[prof] plain batches: mean=${plain.sum / plain.size}%.2f s " +
      f"first-cycle mean=${firstCycle.sum / firstCycle.size}%.2f s " +
      f"last-cycle mean=${lastCycle.sum / lastCycle.size}%.2f s")
    println(f"[prof] compaction batches: mean=${compacts.sum / compacts.size}%.2f s " +
      f"(n=${compacts.size})")
    spark.stop()
  }
}
