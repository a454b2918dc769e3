package graft

import graft.sources.TableSink
import graft.warehouse.Skew
import org.apache.spark.sql.functions._

/** The scale toolkit's observable guarantees: salting preserves join
  * semantics while spreading hot keys; bucketed tables join with no
  * Exchange (SCALE.md). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // synthetic skew: 90% of orders hit one customer key
    val skewed = Tables.orders(spark, sf)
      .withColumn("hot_key",
        when($"o_orderkey" % 10 =!= 0, lit(7L)).otherwise($"o_custkey"))
    val dim = Tables.customer(spark, sf)
      .select($"c_custkey".as("hot_key"), $"c_mktsegment")
    val plain = skewed.join(dim, "hot_key")
      .agg(count(lit(1)), sum($"o_totalprice")).head
    val salted = Skew.saltedJoin(skewed, dim, "hot_key", salt = 8)
      .agg(count(lit(1)), sum($"o_totalprice")).head
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }

  test("bucketed tables join with no shuffle exchange") {
    TableSink.writeBucketed(Tables.orders(spark, sf), "b_orders", 8, Seq("o_custkey"))
    TableSink.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", 8, Seq("o_custkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1500))
      assert(joined.count() == Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf),
          $"o_custkey" === $"c_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed block registry: the q100 anti-join reads it with no registry-side exchange") {
    // at 100 TB the registry is corpus-sized (one 16-byte row per
    // distinct block) while each crawl batch is small: stored bucketed
    // on the hash key, the per-batch knockout shuffles ONLY the batch.
    // Assert the plan: registry scan side has no Exchange above it.
    import graft.operators.Dedup
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec}
    val docs = Tables.documents(spark, sf)
    TableSink.writeBucketed(Dedup.blockRegistry(docs), "b_registry", 8,
      Seq("h_lo", "h_hi"))
    val registry = spark.table("b_registry")
    val batch = docs.filter($"doc_id" % 7 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.paragraphDedupIncremental(registry, batch)
      df.collect() // finalize AQE on THIS plan
      val nodes = walk(df.queryExecution.executedPlan)
      val antiJoins = nodes.collect {
        case j: BaseJoinExec if j.joinType.sql == "LEFT ANTI" => j
      }
      assert(antiJoins.nonEmpty, "expected the registry knockout anti-join")
      antiJoins.foreach { j =>
        // the registry is the anti-join's RIGHT side: bucketed scan
        // satisfies its distribution, so no shuffle may sit under it
        val rightShuffles = walk(j.right)
          .collect { case e: ShuffleExchangeExec => e }
        withClue(j.simpleString(10)) { assert(rightShuffles.isEmpty) }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("registry compaction: idempotent under re-union, keeps the no-exchange anti-join layout") {
    // the crawl loop's state update (VERDICT r8 §next-6): registry(n+1) =
    // compact(registry(n), batch). Three contracts: (1) compaction equals
    // the from-scratch registry of corpus∪batch (so the loop never needs
    // a corpus-sized rebuild); (2) re-feeding the same batch is a no-op;
    // (3) a compacted registry WRITTEN back bucketed still serves the
    // q100 anti-join with no registry-side exchange.
    import graft.operators.Dedup
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter($"doc_id" % 5 === 0)
      .withColumn("doc_id", $"doc_id" + 3000000L)
    val r0 = Dedup.blockRegistry(docs)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val compacted = Dedup.compactedRegistry(r0, batch)
    val scratch = Dedup.blockRegistry(docs.select("doc_id", "text")
      .unionByName(batch.select("doc_id", "text")))
    assert(compacted.collect().map(key).sorted
      .sameElements(scratch.collect().map(key).sorted))
    val again = Dedup.compactedRegistry(compacted, batch)
    assert(again.collect().map(key).sorted
      .sameElements(compacted.collect().map(key).sorted))
    // (3): write the compacted registry bucketed; the knockout anti-join
    // must read it with no exchange above the registry-side scan
    TableSink.writeBucketed(compacted, "b_registry_compacted", 8,
      Seq("h_lo", "h_hi"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.paragraphDedupIncremental(
        spark.table("b_registry_compacted"),
        docs.filter($"doc_id" % 3 === 0)
          .withColumn("doc_id", $"doc_id" + 4000000L))
      df.collect()
      val antiJoins = walk(df.queryExecution.executedPlan).collect {
        case j: BaseJoinExec if j.joinType.sql == "LEFT ANTI" => j
      }
      assert(antiJoins.nonEmpty, "expected the registry knockout anti-join")
      antiJoins.foreach { j =>
        val rightShuffles = walk(j.right)
          .collect { case e: ShuffleExchangeExec => e }
        withClue(j.simpleString(10)) { assert(rightShuffles.isEmpty) }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q103 keyed landing: the fact window reuses the landed partitioning (no exchange)") {
    // VERDICT r9 §next-6 fusion pin: with Clean.stageKeyed the fact
    // dedup/SK window partitions by the LANDED __f_pid column, and the
    // localCheckpoint preserved the fill exchange's HashPartitioning —
    // so between the checkpoint scan and the window there must be NO
    // shuffle (a regression reintroduces the second full-width exchange
    // of the 600k-row staged batch)
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val star = graft.ibrd.IbrdScale.star(spark, sf)
    star.fact.count()
    // the dedup/SK window lives inside the persisted `unique` relation —
    // PlanWalk descends through InMemoryTableScan into the cached plan
    val plan = star.fact.queryExecution.executedPlan
    val factWindows = walk(plan).collect {
      case w: WindowExec if w.partitionSpec.exists(_.toString.contains("__f_pid")) => w
    }
    assert(factWindows.nonEmpty, "fact dedup window not found:\n" +
      plan.toString.take(2000))
    factWindows.foreach { w =>
      val shufflesBelow = walk(w).collect { case e: ShuffleExchangeExec => e }
      assert(shufflesBelow.isEmpty,
        "fact window re-exchanged the landed batch:\n" + w.toString.take(2000))
    }
  }

  test("q99 plan: every exchange keys on hashes or doc_id — block text never shuffles") {
    // the at-scale contract of paragraphDedupHashed (SCALE.md): the two
    // corpus-wide exchanges carry 16-byte hash keys (h_lo, h_hi) or
    // doc_id — if any hashpartitioning expression referenced the block
    // text, the whole point of the hash-keyed variant would be gone.
    // Pin the physical plan so a refactor can't silently regress it.
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // q102's segmentation is a native scan-stage projection since round
    // 9 (functions/CdcBlocksExpr.scala) — its exchange discipline is now
    // identical to q99's: hash keys and doc_id only, never block text,
    // never per-word position keys
    // q108's exchanges may key only on the 8-byte window hash (g) or
    // doc_id — token text and word arrays must stay in the scan stage
    val allowedByQuery = Map(
      "q99_paragraph_dedup_hashed" -> Set("h_lo", "h_hi", "doc_id"),
      "q102_paragraph_dedup_cdc_hashed" -> Set("h_lo", "h_hi", "doc_id"),
      "q108_span_rewrite" -> Set("g", "doc_id"))
    allowedByQuery.foreach { case (q, allowed) =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE on THIS plan
      val exchanges = walk(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, s"$q: expected shuffles")
      exchanges.foreach { e =>
        val keyAttrs = e.outputPartitioning match {
          case hp: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            hp.expressions.flatMap(_.references.map(_.name))
          case _ => Seq.empty
        }
        withClue(s"$q exchange keys $keyAttrs in:\n${e.simpleString(5)}") {
          assert(keyAttrs.forall(allowed.contains))
        }
      }
    }
  }

  test("q80 bucketed join plan: the only exchange is the final aggregate's") {
    val df = operators.Warehouse.bucketedJoin(spark, sf)
    df.collect() // finalize AQE on THIS plan
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val nodes = walk(df.queryExecution.executedPlan)
    val joins = nodes.collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, "expected a sort-merge join (MERGE hint)")
    // no exchange anywhere BELOW the join: the bucketed scans already
    // satisfy the join's distribution
    val shufflesUnderJoin = joins.flatMap(j => j.children.flatMap(walk))
      .collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      df.queryExecution.executedPlan.toString.take(2000))
  }

  test("q132 plan: the registry's probe explosion semi-joins the batch cells by BROADCAST — no registry-side exchange") {
    // the q132 scale claim (SCALE.md §Sign-LSH): only probe rows landing
    // in a cell the batch occupies survive, and they must be filtered by
    // a broadcast of the (small) batch-cell set — a shuffle there would
    // exchange the exploded REGISTRY (corpus × (bits+1) rows) every
    // batch, exactly the cost the stored index exists to avoid
    import graft.operators.Similarity
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.GenerateExec
    // a cached embeddings relation (another suite's .cache()) would
    // replace the FileScan and hide the pushed-filter marker below
    spark.catalog.clearCache()
    // pin the broadcast threshold (advisor r11): the assertion tests the
    // PLAN SHAPE — that the batch-cell set reaches the registry side as
    // a broadcast — not whether this sf's cell set happens to sit under
    // the environment's default 10 MB cutoff
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val nodes = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (256L * 1024 * 1024).toString)
      val emb = Tables.embeddings(spark, sf)
      val cutoff = (emb.agg(max($"vec_id")).head.getLong(0) + 1) * 7 / 10
      val out = Similarity.embeddingNearDupsIncremental(
        Similarity.signBucketRegistry(
          emb.filter($"vec_id" < cutoff), Similarity.SignBits),
        emb.filter($"vec_id" >= cutoff), Similarity.SignBits, 0.4)
      out.collect() // finalize AQE on THIS plan
      walk(out.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // the probe explosion exists and feeds a broadcast join somewhere
    assert(nodes.exists(_.isInstanceOf[GenerateExec]),
      "expected the probe-set explosion")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "expected broadcast joins over the probe explosion")
    // the registry scan (the side pruned by vec_id < cutoff — its pushed
    // filter is the plan's unique LessThan marker) must never sit under
    // a ShuffleExchange: every exchange in this plan may carry only
    // batch-derived rows (the batch-cell distinct, the batch side)
    val registryMarker = "LessThan(vec_id"
    assert(nodes.exists(_.toString.contains(registryMarker)),
      "expected the registry-side scan")
    nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val carriesRegistry = walk(e).exists(_.toString.contains(registryMarker))
      withClue(e.simpleString(10)) { assert(!carriesRegistry) }
    }
  }

  test("q135 plan: the stored cluster mapping is rewritten by BROADCAST relabel — no mapping-side exchange") {
    // the q135 scale claim (SCALE.md §dedup): the corpus-sized mapping
    // SCANS through the relabel but never shuffles — every exchange in
    // the rewrite plan may carry only batch-derived rows. The explicit
    // broadcast() hint makes the shape threshold-independent.
    import graft.operators.Dedup
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    TableSink.writeBucketed(
      Dedup.clusterIds(docs.filter($"doc_id" % 7 =!= 0), 0.8),
      "q135pin_mapping", 8, Seq("doc_id"))
    val mapping = spark.table("q135pin_mapping")
    val batchIds = docs.filter($"doc_id" % 7 === 0).select($"doc_id")
    val out = Dedup.componentsIncremental(
      mapping, Dedup.jaccardPairsIncremental(docs, batchIds, 0.8), batchIds)
    out.collect() // finalize AQE on THIS plan
    val nodes = walk(out.queryExecution.executedPlan)
    val marker = "q135pin_mapping"
    assert(nodes.exists(n =>
      n.getClass.getSimpleName.startsWith("FileSourceScan") &&
        n.toString.contains(marker)),
      "expected the stored-mapping scan in the rewrite plan")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "expected the broadcast root->root relabel join")
    nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val carriesMapping = walk(e).exists(_.toString.contains(marker))
      withClue(e.simpleString(10)) { assert(!carriesMapping) }
    }
  }

  test("q144 plan: the stored frame-fingerprint registry streams through the knockout — no registry-side exchange") {
    // the q144 scale claim (SCALE.md §multimodal near-dup): the batch's
    // distinct fingerprints BROADCAST against the registry scan, so the
    // corpus-sized registry is never reshuffled — every exchange in the
    // knockout plan may carry only batch-derived rows.
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val regDir = java.nio.file.Files
      .createTempDirectory("graft_q144pin_reg").toString
    operators.Multimodal.videoPrintRegistry(
        graft.multimodal.Binary.syntheticAviClips(
          docs.filter($"doc_id" % 4 =!= 3)))
      .write.mode("overwrite").parquet(s"$regDir/registry")
    val out = operators.Multimodal.videoDedupIncremental(
      spark.read.parquet(s"$regDir/registry"),
      graft.multimodal.Binary.syntheticAviClips(
        docs.filter($"doc_id" % 4 === 3)),
      dropAt = 0.5)
    out.collect() // finalize AQE on THIS plan
    val nodes = walk(out.queryExecution.executedPlan)
    val marker = "q144pin_reg"
    assert(nodes.exists(n =>
      n.getClass.getSimpleName.startsWith("FileSourceScan") &&
        n.toString.contains(marker)),
      "expected the stored-registry scan in the knockout plan")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "expected the batch fingerprints to broadcast against the registry")
    // any exchange whose subtree reaches the registry scan must sit
    // ABOVE the broadcast join — i.e. it moves the join's output (at
    // most batch-fingerprint-many rows, partially aggregated), never
    // raw registry rows. An exchange between the scan and the join
    // would contain the scan but not the join, and fails here.
    nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val sub = walk(e)
      val carriesRegistry = sub.exists(_.toString.contains(marker))
      val aboveJoin = sub.exists(_.isInstanceOf[BroadcastHashJoinExec])
      withClue(e.simpleString(10)) { assert(!carriesRegistry || aboveJoin) }
    }
  }

  test("q138 plan: the stored cell-partitioned IVF-PQ index is read PARTITION-PRUNED — only probed cells' files") {
    // the q138 scale claim (SCALE.md §IVF-PQ): writing the coded index
    // partitionBy(cell) makes probing a storage-level selection. One
    // query probes IvfProbes of IvfCentroids cells, so the search scan
    // must carry a partition filter on cell and read strictly fewer
    // files than the index holds.
    import graft.operators.Similarity
    import graft.plans.PlanWalk.walk
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.catalog.clearCache()
    val emb = Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_q138pin").toString
    Similarity.ivfPqIndex(emb)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$root/index")
    val stored = spark.read.parquet(s"$root/index")
      .withColumn("cell", $"cell".cast("long"))
    val totalFiles = stored.inputFiles.length
    val out = Similarity.ivfPqSearch(stored,
      emb.filter($"vec_id" === 3), emb, 5, pruneStored = true)
    out.collect() // finalize AQE, populate scan metrics
    val scans = walk(out.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft_q138pin")) => f
    }
    assert(scans.nonEmpty, "expected the stored-index scan in the search plan")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"stored-index scan carries no partition filter: ${f.simpleString(10)}")
      val read = f.metrics("numFiles").value
      withClue(s"files read $read of $totalFiles") {
        assert(read > 0 && read < totalFiles)
      }
    }
  }

  test("q182 politeness at a 10^6-host frontier: the cross-host rank is range-bucketed, never a single-task sort") {
    // VERDICT r15 watch item #3: the catalog's host dims are
    // dictionary-sized, but the full web is 10^8-10^9 hosts — one fat
    // task sorting all of them would be the scheduler's scale wall.
    // The rank now rides SurrogateKeys.assign's range-partitioned path
    // (driver-pinned bucket bounds, per-bucket offsets); assert on a
    // synthetic million-host frontier that the plan carries NO range
    // exchange into one partition (the old repartitionByRange(1, ...)
    // shape) and that the rank's sort runs partitioned by the pinned
    // bucket id. Semantics unchanged: the (priority desc, host) total
    // order still holds at the extremes.
    val canon = spark.range(1000000L)
      .select(concat(lit("http://h"), $"id", lit(".com/p")).as("canon_url"),
        concat(lit("h"), $"id", lit(".com")).as("dst_host"))
    val prio = spark.range(100000L)
      .select(concat(lit("h"), $"id" * 10, lit(".com")).as("dst_host"),
        (-$"id" - 1L).as("s_sum"))
    val sched = graft.operators.Crawl.politenessSchedule(canon, prio)
    val plan = sched.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "host rank must not range-exchange the host dim into one task")
    assert(plan.contains("__sk_pid"),
      "host rank should ride SurrogateKeys' driver-pinned bucket path")
    assert(sched.count() == 1000000L)
    // unknown hosts sit at priority 0 — above every negative quality
    // mass — and rank 1 is the lexicographically-first such host
    val top = sched.filter($"host_rank" === 1L)
      .select($"dst_host", $"priority").head
    assert(top.getLong(1) == 0L, s"rank-1 priority: ${top.getLong(1)}")
  }
}
