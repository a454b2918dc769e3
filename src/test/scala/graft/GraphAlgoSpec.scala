package graft

import graft.operators.{Graph, LinkGraph, NgramLm}
import org.apache.spark.sql.functions._

/** q166 BFS, q167 LPA, q168 LM gate, q169 host rollup: hand-graph
  * properties the sf corpus can't isolate (shorter-path-wins,
  * unreachable stay out, bridge edges don't merge communities,
  * deterministic tie-breaks), driver-side replays of the loops, and
  * the integer-gate membership law. */
class GraphAlgoSpec extends SparkSpec {
  import spark.implicits._

  // ---- q166 BFS ----

  private def runBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                     nodes: Seq[Long], rounds: Int): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val d0 = nodes.toDF("node").select(col("node"),
      when(col("node").isin(seeds.toSeq: _*), 0L).as("dist"))
    Graph.bfsLoop(e, d0, rounds).filter(col("dist").isNotNull)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side BFS replay (plain Scala) for cross-checking. */
  private def replayBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                        rounds: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relax = dist.toSeq.flatMap { case (n, d) =>
        adj.getOrElse(n, Nil).map(_ -> (d + 1)) }
      val best = relax.groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
      dist = (dist.keySet ++ best.keySet).map { n =>
        n -> math.min(dist.getOrElse(n, Long.MaxValue),
          best.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    dist
  }

  test("bfs: shorter path wins, unreachable stay out, directedness holds") {
    // 1→2→3→4→5→6 chain with a 1→4 shortcut; 7 isolated; 8→1 points
    // AT the seed (must not make 8 reachable — edges are directed).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (8L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val got = runBfs(edges, Set(1L), nodes, Graph.BfsRounds)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L,
      6L -> 3L), "shortcut must win over the long chain")
    assert(!got.contains(7L) && !got.contains(8L))
  }

  test("bfs: round budget truncates the frontier; two seeds take the min") {
    val chain = (1L to 7L).sliding(2).map(p => (p(0), p(1))).toSeq
    val one = runBfs(chain, Set(1L), (1L to 7L).toSeq, 2)
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
      "2 rounds must reach exactly depth 2")
    val two = runBfs(chain, Set(1L, 6L), (1L to 7L).toSeq, 2)
    assert(two == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 0L, 7L -> 1L),
      "the 6-seed wave reaches only 7 (directed chain)")
  }

  test("bfs: Spark loop == driver-side replay on a dense hand graph") {
    val edges = for {
      s <- 0L to 19L; d <- 0L to 19L
      if s != d && (s * 7 + d * 3) % 11 == 0
    } yield (s, d)
    val seeds = Set(0L, 13L)
    val got = runBfs(edges, seeds, (0L to 19L).toSeq, Graph.BfsRounds)
    assert(got == replayBfs(edges, seeds, Graph.BfsRounds))
  }

  test("q166 on the sf trade graph: multi-hop depth is real") {
    val hist = Graph.bfsReach(spark, sf).groupBy(col("dist"))
      .agg(count(lit(1)).as("c")).as[(Long, Long)].collect().toMap
    assert(hist.keySet.max >= 2,
      s"trade graph must exercise ≥2 hops, got $hist")
    assert(hist(0L) > 0, "seed customers exist at sf0.001")
  }

  test("incremental bfs: warm-start over added edges == fresh full BFS") {
    // base chain s(0)→2→4; batch adds 4→6→8 plus a new disconnected
    // seed-node 200→10. Warm-start law: stored base distances + enough
    // relaxations over the full edges must equal a fresh full-graph
    // BFS, because edge additions only shorten unit-weight distances.
    val base = Seq((0L, 2L), (2L, 4L))
    val added = Seq((4L, 6L), (6L, 8L), (200L, 10L))
    val full = base ++ added
    val baseNodes = Seq(0L, 2L, 4L)
    val allNodes = Seq(0L, 2L, 4L, 6L, 8L, 200L, 10L)
    def seeded(ns: Seq[Long]) = ns.toDF("node").select(col("node"),
      when(col("node") % 200 === 0, 0L).as("dist"))
    val stored = Graph.bfsLoop(base.toDF("src", "dst"),
      seeded(baseNodes), Graph.BfsRounds)
    // warm frame: stored dist where known, else the seed rule
    val warm = allNodes.toDF("node")
      .join(stored.withColumnRenamed("dist", "bdist"), Seq("node"), "left")
      .select(col("node"),
        when(col("bdist").isNotNull, col("bdist"))
          .when(col("node") % 200 === 0, 0L).as("dist"))
    val incr = Graph.bfsLoop(full.toDF("src", "dst"), warm, 3)
      .filter(col("dist").isNotNull).as[(Long, Long)].collect().toMap
    val fresh = Graph.bfsLoop(full.toDF("src", "dst"), seeded(allNodes), 8)
      .filter(col("dist").isNotNull).as[(Long, Long)].collect().toMap
    assert(incr == fresh)
    assert(incr(10L) == 1L, "batch-new seed 200 must reach 10")
  }

  test("q171 on sf: append only improves — incremental ⊇ base, never worse") {
    val incr = Graph.bfsReachIncremental(spark, sf)
      .as[(Long, Long)].collect().toMap
    val eBase = Graph.tradeEdges(spark, sf,
      pmod(col("o_orderkey"), lit(Graph.BatchMod.toLong)) =!= 0L)
    val b0 = eBase.select(col("src").as("node")).distinct()
      .select(col("node"), when(pmod(col("node"), lit(200L)) === 0L, 0L)
        .as("dist"))
    val stored = Graph.bfsLoop(eBase, b0, Graph.BfsRounds)
      .filter(col("dist").isNotNull).as[(Long, Long)].collect().toMap
    stored.foreach { case (n, d) =>
      assert(incr.contains(n) && incr(n) <= d,
        s"node $n regressed: base $d vs incr ${incr.get(n)}")
    }
  }

  test("q176 weighted reach == driver Bellman-Ford; agrees with BFS reachability") {
    val e = Graph.tradeEdgesWeighted(spark, sf)
      .as[(Long, Long, Long)].collect()
    def seed(n: Long) = n % 200 == 0
    val nodes = e.map(_._1).distinct
    var cost = nodes.filter(seed).map(_ -> 0L).toMap
    for (_ <- 1 to Graph.BfsRounds) {
      val relax = e.flatMap { case (s, d, w) =>
        cost.get(s).map(c => d -> (c + w)) }
      val best = relax.groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).min }
      cost = (cost.keySet ++ best.keySet).map { n =>
        n -> math.min(cost.getOrElse(n, Long.MaxValue),
          best.getOrElse(n, Long.MaxValue)) }.toMap
    }
    val got = Graph.weightedReach(spark, sf).as[(Long, Long)].collect().toMap
    assert(got == cost)
    // same edge set ⇒ same reachability as BFS; weights ≥ 1 ⇒ cost ≥ dist
    val dist = Graph.bfsReach(spark, sf).as[(Long, Long)].collect().toMap
    assert(got.keySet == dist.keySet)
    assert(got.forall { case (n, c) => c >= dist(n) })
  }

  test("q177 incremental LPA: full host universe, batch-new hosts labeled") {
    val docs = Tables.documents(spark, sf)
    val incr = LinkGraph.lpaCommunities(spark, docs) // full-graph label set
      .select(col("node")).as[String].collect().toSet
    val got = LinkGraph.lpaCommunitiesIncremental(spark, docs)
      .as[(String, String)].collect().toMap
    assert(got.keySet == incr, "incremental must label the FULL host universe")
    // batch-new hosts (absent from the base graph) still get labels;
    // base = full-corpus link derivation restricted by src_doc
    val eb = LinkGraph.hostEdges(docs,
      pmod(col("src_doc"), lit(Graph.BatchMod.toLong)) =!= 0L)
    val baseHosts = eb.select(col("src").as("node"))
      .unionByName(eb.select(col("dst").as("node")))
      .distinct().as[String].collect().toSet
    val newcomers = got.keySet -- baseHosts
    newcomers.foreach(n => assert(got(n).nonEmpty))
  }

  test("q178 link prediction == driver replay; each pair once, thresholded") {
    val cs = Graph.tradeEdges(spark, sf)
      .filter(pmod(col("src"), lit(2L)) === 0L)
      .as[(Long, Long)].collect()
    val bySupp = cs.groupBy(_._2).view.mapValues(_.map(_._1).distinct.sorted)
    val expect = bySupp.values.flatMap { custs =>
      for (i <- custs.indices; j <- i + 1 until custs.length)
        yield (custs(i), custs(j))
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .filter(_._2 >= Graph.CnMin)
    val got = Graph.commonNeighborPairs(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == expect)
    assert(got.keys.forall { case (a, b) => a < b })
  }

  // ---- q172 personalized PageRank ----

  test("q172 == exact-integer driver replay on the sf trade graph") {
    val e = Graph.tradeEdges(spark, sf).as[(Long, Long)].collect()
    val od = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = e.map(_._1).distinct
    def seed(n: Long) = n % 200 == 0
    var r = nodes.map(n => n -> (if (seed(n)) Graph.Scale else 0L)).toMap
    for (_ <- 1 to Graph.PprRounds) {
      val inc = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) =>
          java.lang.Math.floorDiv(r(s), od(s)) }.sum }
      r = nodes.map { n =>
        n -> ((if (seed(n)) Graph.Scale * 15 / 100 else 0L) +
          java.lang.Math.floorDiv(85 * inc.getOrElse(n, 0L), 100))
      }.toMap
    }
    val got = Graph.pprTrade(spark, sf).as[(Long, Long)].collect().toMap
    assert(got == r)
    assert(got.exists { case (n, v) => !seed(n) && v > 0 },
      "mass must flow beyond the seeds")
  }

  // ---- q174 k-core ----

  private def runKcore(und: Seq[(Long, Long)], rounds: Int, k: Int)
      : Map[Long, Long] = {
    val sym = (und ++ und.map(_.swap)).distinct.toDF("src", "dst")
    Graph.kcorePeel(sym, rounds, k).as[(Long, Long)].collect().toMap
  }

  test("kcore: a triangle survives k=2, its tail is peeled") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(runKcore(und, 4, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: the peel CASCADES — a chain unravels one round per end") {
    val chain = (1L to 5L).sliding(2).map(p => (p(0), p(1))).toSeq
    // k=2: r1 drops 1,5; r2 drops 2,4 (their degree FELL to 1); r3
    // drops 3. A single-filter implementation would keep 2,3,4.
    assert(runKcore(chain, 4, 2).isEmpty)
    assert(runKcore(chain, 1, 2) == Map(2L -> 1L, 3L -> 2L, 4L -> 1L),
      "after one peel the inner chain remains, mid-cascade")
  }

  test("kcore: Spark peel == driver replay on a hash hand graph") {
    val und = (for {
      a <- 0L to 24L; b <- 0L to 24L
      if a < b && (a * 5 + b * 11) % 7 == 0
    } yield (a, b)).toSeq
    // driver replay
    val sym = (und ++ und.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    var alive = adj.keySet
    for (_ <- 1 to Graph.CoreRounds)
      alive = alive.filter(n => (adj(n) & alive).size >= Graph.CoreK)
    val expect = alive.map(n => n -> (adj(n) & alive).size.toLong).toMap
    assert(runKcore(und, Graph.CoreRounds, Graph.CoreK) == expect)
  }

  // ---- q173 negative sampling ----

  test("q173 == driver replay; negatives never hit the pair members") {
    val docs = Tables.documents(spark, sf)
    val pairs = Graph.skipgramPairs(spark, docs)
      .as[(Long, Long, Long)].collect()
    val nn = docs.count()
    val expect = pairs.flatMap { case (c, x, n) =>
      (0L until Graph.NegK.toLong).map { i =>
        val neg = java.lang.Math.floorMod(
          c * Graph.B1 + x * Graph.B2 + (i + 1) * Graph.A, nn)
        (c, x, n, i, neg)
      }.filter(t => t._5 != c && t._5 != x)
    }.toSet
    val got = Graph.negativeSamples(spark, docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.forall(t => t._5 != t._1 && t._5 != t._2))
    assert(got.size < pairs.length.toLong * Graph.NegK ||
      pairs.forall { case (c, x, _) => (0L until Graph.NegK.toLong)
        .forall { i => val neg = java.lang.Math.floorMod(
          c * Graph.B1 + x * Graph.B2 + (i + 1) * Graph.A, nn)
          neg != c && neg != x } },
      "collision skip must actually drop rows when collisions occur")
  }

  // ---- q167 LPA ----

  private def runLpa(und: Seq[(String, String)], rounds: Int)
      : Map[String, String] = {
    val sym = (und ++ und.map(_.swap)).distinct.toDF("src", "dst")
    val nodes = (und.map(_._1) ++ und.map(_._2)).distinct
    val l0 = nodes.toDF("node").select(col("node"), col("node").as("label"))
    LinkGraph.lpaLoop(sym, l0, rounds).as[(String, String)].collect().toMap
  }

  /** Driver-side synchronous LPA replay: mode of neighbor labels,
    * ties to the smaller label. */
  private def replayLpa(und: Seq[(String, String)], rounds: Int)
      : Map[String, String] = {
    val sym = (und ++ und.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val nodes = adj.keySet
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        val votes = adj(n).map(lab).groupBy(identity)
          .map { case (l, o) => l -> o.size }
        val best = votes.toSeq.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }.toMap
    }
    lab
  }

  test("lpa: a single bridge edge does not merge two cliques") {
    val cliqueA = Seq(("a1", "a2"), ("a1", "a3"), ("a2", "a3"))
    val cliqueB = Seq(("b1", "b2"), ("b1", "b3"), ("b2", "b3"))
    val und = cliqueA ++ cliqueB ++ Seq(("a3", "b1"))
    val got = runLpa(und, LinkGraph.LpaRounds)
    assert(got == replayLpa(und, LinkGraph.LpaRounds))
    val comms = got.groupBy(_._2).view.mapValues(_.keySet).toMap
    assert(comms.size == 2, s"bridge must not merge the cliques: $got")
    assert(comms.values.toSet ==
      Set(Set("a1", "a2", "a3"), Set("b1", "b2", "b3")))
  }

  test("lpa: all-tie votes break to the smaller label, synchronously") {
    // star center m with leaves x,y: every vote ties at count 1 →
    // round 1 takes the min label; leaves both adopt m.
    val got = runLpa(Seq(("m", "x"), ("m", "y")), 1)
    assert(got == Map("m" -> "x", "x" -> "m", "y" -> "m"))
  }

  test("lpa: Spark loop == driver replay on a mixed hand graph") {
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("g", "a"), ("g", "b"))
    for (r <- 1 to 3)
      assert(runLpa(und, r) == replayLpa(und, r), s"round $r")
  }

  test("q167 on the sf host graph: labels converge to ≥2 communities") {
    val labs = LinkGraph.lpaCommunities(spark,
      Tables.documents(spark, sf))
    val n = labs.select(col("label")).distinct().count()
    assert(n >= 2, s"host graph must keep ≥2 communities, got $n")
  }

  // ---- q168 LM gate ----

  test("q168 gate: membership is exactly the integer above-mean law") {
    val docs = Tables.documents(spark, sf)
    val scored = NgramLm.docScoresMilli(docs)
      .as[(Long, Long, Long)].collect()
    val tot = scored.map(_._3).sum
    val nd = scored.length.toLong
    val expect = scored.filter(t => t._3 * nd >= tot).map(_._1).toSet
    val got = NgramLm.lmQualityGate(docs)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < nd,
      s"gate must split the corpus, kept ${got.size} of $nd")
  }

  test("docScoresMilli: docs with <3 tokens carry no score row") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(Seq((900001L, "just two")).toDF("doc_id", "text"))
    val ids = NgramLm.docScoresMilli(docs).select(col("doc_id"))
      .as[Long].collect().toSet
    assert(!ids.contains(900001L))
  }

  // ---- q169 host rollup ----

  test("q169 rollup == driver-side join of links × scores") {
    val docs = Tables.documents(spark, sf)
    val scores = NgramLm.docScoresMilli(docs)
      .select(col("doc_id"), col("s_milli")).as[(Long, Long)]
      .collect().toMap
    val links = LinkGraph.extractLinks(LinkGraph.pages(docs))
      .as[(Long, String)].collect()
    val expect = links.filter(l => scores.contains(l._1))
      .groupBy(_._2).map { case (h, ls) =>
        h -> ((ls.length.toLong, ls.map(_._1).distinct.length.toLong,
          ls.map(l => scores(l._1)).sum))
      }
    val got = NgramLm.hostQualityRollup(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got == expect)
  }
}
