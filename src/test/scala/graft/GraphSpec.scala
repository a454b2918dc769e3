package graft

import graft.operators.Graph
import graft.plans.PlanWalk.walk
import graft.sources.TableSink
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** PageRank (q153): exact-integer arithmetic vs a driver-side reference,
  * the teleport-floor/mass invariants, and the 100 TB layout claim — a
  * bucketed edge table serves the per-round rank join with no edge-side
  * exchange (only the small rank vector moves between iterations). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** The same integer arithmetic as Graph.pagerank, in plain Scala. */
  private def refPagerank(ids: Seq[Long]): Map[Long, Long] = {
    val n = ids.size.toLong
    val nodes = ids.map(id => ((id % n) + n) % n).distinct
    val edges = nodes.flatMap(s =>
      (0 until Graph.OutDegree).map(j => (s, (s * Graph.A + j) % n)))
    var r = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to Graph.Iterations) {
      val inc = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => r(e._1) / Graph.OutDegree).sum }
      r = nodes.map(nd =>
        nd -> (Graph.Scale * 15 / 100 + 85 * inc.getOrElse(nd, 0L) / 100)).toMap
    }
    r
  }

  test("pagerank equals the driver-side integer reference, bit for bit") {
    val docs = Tables.documents(spark, sf)
    val ids = docs.select($"doc_id").as[Long].collect().toSeq
    val got = Graph.pagerank(spark, docs)
      .as[(Long, Long)].collect().toMap
    assert(got == refPagerank(ids))
  }

  test("teleport floor holds and total mass is bounded by the start mass") {
    val r = Graph.pagerank(spark, Tables.documents(spark, sf))
      .agg(min($"r"), max($"r"), sum($"r"), count(lit(1))).head
    val n = r.getLong(3)
    assert(r.getLong(0) >= Graph.Scale * 15 / 100) // no node below teleport
    // integer DIVs only LOSE mass: total never exceeds n·Scale, and the
    // floor keeps at least the teleport share in play
    assert(r.getLong(2) <= n * Graph.Scale)
    assert(r.getLong(2) >= n * (Graph.Scale * 15 / 100))
    // the multiplicative-hash graph is near-regular, so no node may
    // exceed uniform mass by more than its in-degree surplus allows
    assert(r.getLong(1) <= n * Graph.Scale)
  }

  test("triangle counts equal a brute-force reference, every triangle once") {
    val docs = Tables.documents(spark, sf)
    val ids = docs.select($"doc_id").as[Long].collect()
    val n = ids.length.toLong
    val und = (for {
      v <- ids.map(i => ((i % n) + n) % n).distinct
      j <- 0 until Graph.OutDegree
      d = (v * Graph.A + j) % n
      if d != v
    } yield (math.min(v, d), math.max(v, d))).distinct
    val undSet = und.toSet
    val cnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- und; (b2, c) <- und if b2 == b && undSet.contains((a, c))) {
      cnt(a) += 1; cnt(b) += 1; cnt(c) += 1
    }
    assert(cnt.nonEmpty, "test graph should contain triangles")
    val got = Graph.triangleCounts(spark, docs).as[(Long, Long)].collect().toMap
    assert(got == cnt.toMap)
  }

  test("planted hub: degree orientation keeps wedges linear where id orientation is quadratic") {
    // one node of degree k ≫ avg, planted at a MID id (the id-orientation
    // worst case: half its neighbors on each id side → (k/2)² wedges
    // through it). Star hub—spoke plus a spoke ring so triangles exist.
    val k = 400
    val hub = (k / 2).toLong
    val spokes = (0L to k.toLong).filterNot(_ == hub)
    val undSeq = (spokes.map(s => (math.min(s, hub), math.max(s, hub))) ++
      spokes.zip(spokes.tail).map { case (x, y) =>
        (math.min(x, y), math.max(x, y)) }).distinct
    val und = undSeq.toDF("a", "b")
    // degree orientation: the hub ranks last, its out-degree is ~0, and
    // every wedge middle is a degree-3 spoke — linear in k
    val wedges = Graph.orientedWedges(Graph.orientByDegree(und)).count()
    assert(wedges <= 8L * k, s"wedges=$wedges not linear in k=$k")
    // id orientation on the same graph: the mid-id hub is the middle of
    // every (lower-id in, higher-id out) pair — quadratic
    val idWedges = und.alias("e1")
      .join(und.alias("e2"), col("e1.b") === col("e2.a")).count()
    assert(idWedges >= (k.toLong / 2) * (k / 2) / 2,
      s"idWedges=$idWedges — planted hub did not go quadratic under id order")
    assert(idWedges > 10 * wedges,
      s"degree orientation should beat id orientation: $wedges vs $idWedges")
    // and the hardened enumeration is still exact vs brute force
    val undSet = undSeq.toSet
    val cnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- undSeq; (b2, c) <- undSeq
         if b2 == b && undSet.contains((a, c))) {
      cnt(a) += 1; cnt(b) += 1; cnt(c) += 1
    }
    assert(cnt.nonEmpty, "planted graph should contain triangles")
    val got = Graph.triangleCountsUndirected(und).as[(Long, Long)].collect().toMap
    assert(got == cnt.toMap)
  }

  test("incremental pagerank: the warm-started rounds contract toward the full-graph fixpoint") {
    // NB the derived graph is REGULAR (in-degree = out-degree everywhere
    // when gcd(A mod n, n)=1), so the full-graph fixpoint is uniform and
    // a cold uniform start is already AT it — the property that matters
    // for maintenance is that the appended-edge rounds move the STORED
    // base-graph registry strictly toward the new fixpoint (damping
    // contracts the gap by ~0.85 per round).
    val docs = Tables.documents(spark, sf)
    val (nodes, edgesAll) = Graph.linkGraph(spark, docs)
    val r0 = nodes.select($"node", lit(Graph.Scale).as("r"))
    def rounds(start: org.apache.spark.sql.DataFrame, k: Int) =
      (1 to k).foldLeft(start)((r, _) => Graph.step(nodes, edgesAll, r))
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.as[(Long, Long)].collect().toMap
    val fix = toMap(rounds(r0, 10)) // converged-enough reference
    def dist(m: Map[Long, Long]): Long =
      m.map { case (k, v) => math.abs(v - fix(k)) }.sum
    val edgesBase = edgesAll
      .filter(pmod($"src", lit(Graph.BatchMod.toLong)) =!= 0L)
    val stored = toMap((1 to Graph.Iterations).foldLeft(r0)((r, _) =>
      Graph.step(nodes, edgesBase, r)))
    val warm = dist(toMap(Graph.pagerankIncremental(spark, docs)))
    assert(dist(stored) > 0, "base registry should differ from the new fixpoint")
    assert(warm < dist(stored), s"warm=$warm stored=${dist(stored)}")
  }

  test("random-walk corpus: walks follow real edges, one walk per start, exact pair mass") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val fs = Graph.walkFrontiers(spark, docs)
    assert(fs.size == Graph.WalkLen + 1)
    fs.foreach { f =>
      assert(f.count() == n)                             // no walk lost
      assert(f.select($"start").distinct().count() == n) // exactly one per start
    }
    // every consecutive transition is an edge of the derived graph
    val (_, edges) = Graph.linkGraph(spark, docs)
    fs.zip(fs.tail).foreach { case (a, b) =>
      val trans = a.alias("a").join(b.alias("b"), col("a.start") === col("b.start"))
        .select(col("a.node").as("src"), col("b.node").as("dst")).distinct()
      assert(trans.join(edges.distinct(), Seq("src", "dst"), "left_anti").count() == 0)
    }
    // pair mass is exact: 2 directions × WalkLen adjacent slots × n walks
    val total = Graph.skipgramPairs(spark, docs).agg(sum($"n")).head.getLong(0)
    assert(total == 2L * Graph.WalkLen * n)
  }

  test("bucketed edge table: the rank join has no edge-side exchange") {
    val docs = Tables.documents(spark, sf)
    val (nodes, edges) = Graph.linkGraph(spark, docs)
    TableSink.writeBucketed(edges, "b_edges", 8, Seq("src"))
    val bEdges = spark.table("b_edges")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r0 = nodes.select($"node", lit(Graph.Scale).as("r"))
      val df = Graph.step(nodes, bEdges, r0)
      df.collect() // finalize AQE on this plan
      val joins = walk(df.queryExecution.executedPlan).collect {
        case j: BaseJoinExec if j.joinType.sql == "INNER" => j
      }
      assert(joins.nonEmpty, "expected the edges ⋈ ranks join")
      // the bucketed scan satisfies the join's hash distribution on src:
      // at least one inner-join side must be exchange-free (the static
      // 10^11-edge side at 100 TB), so per-round cost is rank-sized
      val ok = joins.exists(j =>
        walk(j.left).collect { case e: ShuffleExchangeExec => e }.isEmpty ||
          walk(j.right).collect { case e: ShuffleExchangeExec => e }.isEmpty)
      assert(ok, df.queryExecution.executedPlan.toString.take(2000))
      // and the bucketed variant computes the same round as the plain one
      val plain = Graph.step(nodes, edges, r0).as[(Long, Long)].collect().toMap
      val bucketed = df.as[(Long, Long)].collect().toMap
      assert(plain == bucketed)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
