package graft.operators

import graft.functions.{NGramHash64, TextOps}
import graft.warehouse.Summary
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The continuous-crawl ingest loop COMPOSED (VERDICT r10 §next-3): the
  * incremental pieces that each ship alone — exact-dup knockout against
  * a hash registry (q100's shape), near-dup knockout against the
  * MinHash band registry (q126), ANN codebook assignment (q123), and
  * materialized-summary maintenance (q127) — driven together per
  * micro-batch, with the registry-compaction lifecycle (r9 §8) landing
  * the stores bucketed every k batches.
  *
  * Per-batch semantics (the drop rule the q130 oracle replays): a batch
  * document is DROPPED iff
  *  - its full text equals any earlier-seen document's (128-bit hash
  *    registry; batch-internal keeper = min doc_id), or
  *  - it forms a verified LSH near-dup pair (the q56 relation: shared
  *    band bucket ∧ Jaccard ≥ τ) with ANY earlier-seen document.
  * "Earlier-seen" means seen, not kept: dropped documents' hashes and
  * band signatures stay in the registries (16 B + ~100 B per doc), so a
  * re-crawl of a dropped page is caught too and the final kept set has
  * the closed form `no exact/near match to any smaller doc_id` — one
  * pass in SQL, no sequential recursion. The ingest contract is the
  * crawl loop's usual one (StreamingSpec r10): doc ids ascend across
  * batches, so "earlier-seen" ≡ "smaller id".
  *
  * Survivors are assigned to the (fixed, broadcast) ANN codebook and
  * the per-lang (count, chars) summary is maintained FROM THE BATCH
  * ALONE ([[Summary.maintain]] — the base corpus is never rescanned).
  *
  * 100 TB shape per batch: every shuffle is batch-proportional (band
  * semi-join moves only touched buckets, verify joins move only
  * candidates, assignment is a broadcast projection, summary delta is
  * |batch| + |groups|); the registries are scanned but never reshuffled
  * (the compacted stores land bucketed — StreamingSpec pins the
  * no-exchange knockout plan after compaction). State handoff between
  * batches is durable storage, not executor memory: monotone stores
  * (hashes, bands, sets, manifest, assignments) take batch-sized
  * APPENDs; only the |groups|-sized summary rewrites (versioned dirs,
  * never overwriting a dir a live plan reads).
  */
object Crawl extends QueryPack {

  /** Crawl state as DataFrames; see [[drive]] for the durable handoff. */
  final case class State(
      seen: DataFrame,     // (h_lo, h_hi) of every SEEN doc
      bands: DataFrame,    // minhash band registry of every seen doc
      sets: DataFrame,     // (doc_id, wset) word-hash sets of every seen doc
      kept: DataFrame,     // kept manifest: (doc_id, lang, n_chars)
      summary: DataFrame,  // maintained per-lang summary (grp, n, __t, total)
      assigned: DataFrame) // (vec_id, cell, sim_r) of kept docs

  /** 128-bit whole-document content hash — the exact-dup registry key
    * (the q98/q99 block-hash scheme applied at document granularity). */
  def docHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      xxhash64(coalesce(col("text"), lit(""))).as("h_lo"),
      xxhash64(lit("graft-q130-hi"), coalesce(col("text"), lit(""))).as("h_hi"))

  private def wordSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      NGramHash64.ngramHashes(TextOps.words(col("text")), 1).as("wset"))

  /** The batch DEDUP verdict — exact then near knockout; the loop's one
    * expensive plan. Pure plan construction: the caller materializes it
    * exactly once (to its store) and derives assignment/summary from
    * the stored slice, not from this plan. */
  def dedupBatch(state: State, batch: DataFrame,
                 verifyThreshold: Double): DataFrame = {
    // 1. exact knockout: registry hit, then batch-internal min-id keeper
    val h = docHashes(batch)
    val survivorIds = h
      .join(state.seen, Seq("h_lo", "h_hi"), "left_anti")
      .groupBy(col("h_lo"), col("h_hi"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactSurvivors = batch.join(survivorIds, Seq("doc_id"))
    // 2. near knockout: verified LSH pairs vs the band registry of all
    //    seen docs plus batch-internal pairs; ascending ingest makes the
    //    larger endpoint the batch member, so pairs.b_id is the drop set.
    //    The candidate batch is ALL batch docs, not just exact survivors:
    //    an exact-dropped batch doc can still be the SMALLER endpoint of
    //    a same-batch near pair, and its registry twin cannot stand in
    //    for it when the twin's lang differs (near-dup pairs are
    //    lang-scoped, exact dedup is not — measured at sf0.1: doc 1641,
    //    text-identical to an earlier doc of another lang, had to
    //    witness the (1641, 1673) pair itself). Its bands only reach the
    //    registry at the NEXT batch, so it must participate here.
    val allSets = state.sets.unionByName(wordSets(batch))
    val pairs = Dedup.minhashCandidatesIncremental(
      state.bands, allSets, batch, verifyThreshold)
    exactSurvivors.join(
      pairs.select(col("b_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** An append-only durable store: batch-sized parquet appends, with a
    * periodic COMPACTION that consolidates base + appends into one
    * bucketed table and starts a fresh append dir — the registry
    * lifecycle a long-running loop needs (small-file control + the
    * pinned no-exchange join layout on the bucket key). */
  private final class Store(spark: SparkSession, root: String,
                            name: String, template: StructType) {
    private var baseTable: Option[String] = None
    private var epoch = 0
    private def dir = s"$root/$name/append$epoch"
    def append(df: DataFrame): Unit =
      df.write.mode("append").parquet(dir)
    def read(): DataFrame = {
      val appended =
        if (new java.io.File(dir).isDirectory) Some(spark.read.parquet(dir))
        else None
      val base = baseTable.map(spark.table)
      (base, appended) match {
        case (Some(b), Some(a)) => b.unionByName(a)
        case (Some(b), None) => b
        case (None, Some(a)) => a
        case (None, None) =>
          spark.createDataFrame(spark.sparkContext
            .emptyRDD[org.apache.spark.sql.Row], template)
      }
    }
    def compact(table: String, buckets: Int, keys: Seq[String]): Unit = {
      val consolidated = read()
      spark.sql(s"DROP TABLE IF EXISTS $table")
      graft.sources.TableSink.writeBucketed(consolidated, table, buckets,
        keys, path = Some(s"$root/$name/compact$epoch"))
      baseTable = Some(table)
      epoch += 1 // fresh append dir; the landed table carries the rest
    }
  }

  /** Incremental loop driver — one instance per crawl loop; call
    * [[ingest]] once per micro-batch (the `foreachBatch` body) and
    * [[state]] for the current stores. Durable handoff under `root`;
    * every `compactEvery` batches the registries consolidate into
    * bucketed tables `<tag>_seen`/`<tag>_bands`/`<tag>_sets` and fresh
    * append dirs start. */
  final class Loop(spark: SparkSession, codebook: DataFrame,
                   embeddings: DataFrame, root: String, tag: String,
                   verifyThreshold: Double = 0.8, compactEvery: Int = 2,
                   buckets: Int = 32, template: StructType) {
    private def emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], template)
    private val seenS = new Store(spark, root, "seen", docHashes(emptyDocs).schema)
    private val bandsS = new Store(spark, root, "bands",
      Dedup.minhashBandRegistry(emptyDocs).schema)
    private val setsS = new Store(spark, root, "sets", wordSets(emptyDocs).schema)
    private val keptS = new Store(spark, root, "kept",
      emptyDocs.select(col("doc_id"), col("lang"), col("n_chars")).schema)
    private val assignedS = new Store(spark, root, "assigned",
      StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sim_r",
          org.apache.spark.sql.types.DoubleType))))
    private var summary = Summary.summarize(emptyDocs, col("lang"), col("n_chars"))
    private var i = 0

    def state(): State = State(seenS.read(), bandsS.read(), setsS.read(),
      keptS.read(), summary, assignedS.read())

    def ingest(batch: DataFrame): Unit = {
      val pre = state() // file listings snapshot BEFORE this batch's appends
      // the expensive dedup plan runs EXACTLY ONCE: its verdict lands in
      // a versioned batch dir, and assignment / manifest / summary all
      // derive from the STORED slice (re-running the LSH verify per
      // consumer tripled the loop's cost, measured 27 s -> below)
      dedupBatch(pre, batch, verifyThreshold)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$root/batch_kept/v$i")
      val kb = spark.read.parquet(s"$root/batch_kept/v$i")
      keptS.append(kb)
      assignedS.append(Similarity.assignBatch(codebook,
        kb.select(col("doc_id").as("vec_id")).join(embeddings, Seq("vec_id"))))
      // summary maintenance from the batch alone (inserts); base = the
      // PRE-append kept store (before-images of inserts are empty, but
      // the post-append store would wrongly retract the batch itself).
      // Versioned summary dir: never overwrite the dir the plan reads.
      Summary.maintain(summary, pre.kept,
        kb.withColumn("op", lit("I")),
        "doc_id", col("lang"), col("n_chars"),
        deleteWhen = col("op") === "D")
        .write.mode("overwrite").parquet(s"$root/summary/v$i")
      summary = spark.read.parquet(s"$root/summary/v$i")
      seenS.append(docHashes(batch))
      bandsS.append(Dedup.minhashBandRegistry(batch))
      setsS.append(wordSets(batch))
      i += 1
      if (i % compactEvery == 0) {
        seenS.compact(s"${tag}_seen", buckets, Seq("h_lo", "h_hi"))
        bandsS.compact(s"${tag}_bands", buckets, Seq("doc_id"))
        setsS.compact(s"${tag}_sets", buckets, Seq("doc_id"))
      }
    }
  }

  /** Batch-mode drive over ascending-id `batches`; returns the final
    * state (reading the stores). */
  def drive(spark: SparkSession, batches: Seq[DataFrame],
            codebook: DataFrame, embeddings: DataFrame, root: String,
            tag: String, verifyThreshold: Double = 0.8,
            compactEvery: Int = 2, buckets: Int = 32): State = {
    require(batches.nonEmpty, "crawl drive needs at least one batch")
    val loop = new Loop(spark, codebook, embeddings, root, tag,
      verifyThreshold, compactEvery, buckets, batches.head.schema)
    batches.foreach(loop.ingest)
    loop.state()
  }

  def queries: Map[String, Q] = Map(
    // ---- the composed loop, end-to-end, final state oracled ----
    // 4 ascending crawl batches over the documents table; codebook =
    // the q123 convention (first IvfCentroids embeddings). The output
    // joins every piece of final state so each is load-bearing in the
    // hash: the kept manifest (exact+near closure), the ANN cell of
    // every kept doc (assignment path), and the per-lang summary values
    // AS MAINTAINED (not recomputed — a drift in the delta path breaks
    // the lang_n/lang_total_chars columns). The entry prices the whole
    // 4-batch drive including state landing — the integration cost, by
    // design (q126 prices the single steady-state step).
    "q130_crawl_pipeline" -> Q(
      (s, d) => {
        val docs = T.documents(s, d)
        val emb = T.embeddings(s, d)
        val codebook = emb.filter(col("vec_id") < Similarity.IvfCentroids)
          .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
        // 4 ascending quartile batches by doc_id (the crawl-ingest order
        // contract); the max is a one-row driver read
        val hi = docs.select(max(col("doc_id"))).head.getLong(0) + 1
        val batches = (0 until 4).map { k =>
          val lo = hi * k / 4
          val up = if (k == 3) hi else hi * (k + 1) / 4
          docs.filter(col("doc_id") >= lo && col("doc_id") < up)
        }
        val root = java.nio.file.Files
          .createTempDirectory("graft_q130").toString
        val st = drive(s, batches, codebook, emb, root,
          tag = "q130_" + d.replaceAll("[^A-Za-z0-9]", "_"))
        st.kept
          .join(st.assigned.select(col("vec_id").as("doc_id"), col("cell")),
            Seq("doc_id"))
          .join(st.summary.select(col("grp").as("lang"),
            col("n").as("lang_n"),
            col("total").as("lang_total_chars")), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("cell"),
            col("lang_n"), col("lang_total_chars"))
      },
      Some(s"""
        WITH ${Dedup.minhashLshPairsCte},
        exactdrop AS (
          SELECT DISTINCT d2.doc_id
          FROM documents d1 JOIN documents d2
            ON coalesce(d1.text, '') = coalesce(d2.text, '')
           AND d1.doc_id < d2.doc_id
        ),
        neardrop AS (
          SELECT DISTINCT b_id AS doc_id FROM lshv WHERE jac >= 0.8
        ),
        kept AS (
          SELECT doc_id, lang, n_chars FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM exactdrop)
            AND doc_id NOT IN (SELECT doc_id FROM neardrop)
        ),
        e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        cents AS (
          SELECT vec_id AS cent_id, v AS centv FROM e
          WHERE vec_id < ${Similarity.IvfCentroids}
        ),
        scored AS (
          SELECT k.doc_id, c.cent_id, ${Similarity.cosSql("b.v", "c.centv")} AS sim
          FROM kept k JOIN e b ON b.vec_id = k.doc_id CROSS JOIN cents c
        ),
        assigned AS (
          SELECT doc_id, cell FROM (
            SELECT doc_id, cent_id AS cell,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY sim DESC, cent_id ASC) AS rn
            FROM scored) WHERE rn = 1
        ),
        summ AS (
          SELECT lang, count(*) AS lang_n,
                 CAST(sum(CAST(n_chars AS DECIMAL(28,2))) AS DOUBLE)
                   AS lang_total_chars
          FROM kept GROUP BY lang
        )
        SELECT k.doc_id, k.lang, k.n_chars, a.cell, s.lang_n, s.lang_total_chars
        FROM kept k
        JOIN assigned a USING (doc_id)
        JOIN summ s ON s.lang = k.lang
      """.stripMargin),
      doc = "continuous-crawl loop composed: exact+near dedup, ANN assign, summary maintain, compaction — final state oracled")
  )
}
