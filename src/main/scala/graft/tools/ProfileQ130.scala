package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where does the q130 composed-loop drive spend its time —
  * dedup verdict, assignment, summary, registry appends, compaction?
  * Not product surface. */
object ProfileQ130 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.operators.{Crawl, Dedup, Similarity}
    import graft.warehouse.Summary
    val docs = graft.Tables.documents(spark, d)
    val emb = graft.Tables.embeddings(spark, d)
    val codebook = emb.filter(col("vec_id") < Similarity.IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val hi = docs.select(max(col("doc_id"))).head.getLong(0) + 1
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val root = java.nio.file.Files.createTempDirectory("graft_p130").toString
      val loop = new Crawl.Loop(spark, codebook, emb, root,
        tag = s"p130_$rep", template = docs.schema, compactEvery = 2)
      (0 until 4).foreach { k =>
        val lo = hi * k / 4
        val up = if (k == 3) hi else hi * (k + 1) / 4
        val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < up)
        time(s"ingest batch $k") { loop.ingest(batch) }
      }
      time("final state join") {
        val st = loop.state()
        st.kept.join(st.assigned.select(col("vec_id").as("doc_id"), col("cell")),
          Seq("doc_id")).count()
      }
      spark.catalog.clearCache(); System.gc()
    }
    // phase breakdown of one mid-loop batch, against a hand-built state
    println("== phase breakdown (batch 2 against first-half state)")
    val root2 = java.nio.file.Files.createTempDirectory("graft_p130b").toString
    val half = docs.filter(col("doc_id") < hi / 2)
    val batch = docs.filter(col("doc_id") >= hi / 2 && col("doc_id") < hi * 3 / 4)
    val seen = time("state: seen hashes") {
      Crawl.docHashes(half).localCheckpoint() }
    val bands = time("state: band registry") {
      Dedup.minhashBandRegistry(half).localCheckpoint() }
    val sets = time("state: word sets") {
      half.select(col("doc_id"), graft.functions.NGramHash64
        .ngramHashes(graft.functions.TextOps.words(col("text")), 1).as("wset"))
        .localCheckpoint() }
    val mapping = time("state: cluster mapping (full CC over first half)") {
      Dedup.componentsFromEdges(half.select(col("doc_id")),
        Dedup.minhashCandidates(half, 0.8)).localCheckpoint() }
    val st = Crawl.State(seen, bands, sets,
      half.select(col("doc_id"), col("lang"), col("n_chars")).localCheckpoint(),
      Summary.summarize(half, col("lang"), col("n_chars")).localCheckpoint(),
      // assigned is unused by the phases below; empty, never null
      emb.limit(0).select(col("vec_id"), col("vec_id").as("cell"),
        lit(0.0).as("sim_r")),
      mapping)
    val pb = time("nearPairs LSH verify + write") {
      Crawl.nearPairs(st, batch, 0.8)
        .write.mode("overwrite").parquet(s"$root2/pairs")
      spark.read.parquet(s"$root2/pairs") }
    time("dedupBatch verdict + write (stored pairs)") {
      Crawl.dedupBatch(st, batch, 0.8, pairs = Some(pb))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$root2/kept") }
    time("cluster delta + write") {
      Crawl.clusterDelta(mapping, batch.select(col("doc_id")), pb)
        .write.mode("overwrite").parquet(s"$root2/clusters") }
    val kb = spark.read.parquet(s"$root2/kept")
    time("assignBatch + write") {
      Similarity.assignBatch(codebook,
        kb.select(col("doc_id").as("vec_id")).join(emb, Seq("vec_id")))
        .write.mode("overwrite").parquet(s"$root2/assigned") }
    time("summary maintain + write") {
      Summary.maintain(st.summary, st.kept, kb.withColumn("op", lit("I")),
        "doc_id", col("lang"), col("n_chars"), col("op") === "D")
        .write.mode("overwrite").parquet(s"$root2/summary") }
    time("append: seen") {
      Crawl.docHashes(batch).write.mode("append").parquet(s"$root2/seen") }
    time("append: bands") {
      Dedup.minhashBandRegistry(batch).write.mode("append").parquet(s"$root2/bands") }
    time("append: sets") {
      batch.select(col("doc_id"), graft.functions.NGramHash64
        .ngramHashes(graft.functions.TextOps.words(col("text")), 1).as("wset"))
        .write.mode("append").parquet(s"$root2/sets") }
    time("compaction: sets bucketed") {
      graft.sources.TableSink.writeBucketed(sets, "p130_sets_c", 32,
        Seq("doc_id"), path = Some(s"$root2/sets_c")) }
    spark.stop()
  }
}
