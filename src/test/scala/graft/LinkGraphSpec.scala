package graft

import graft.operators.{Graph, LinkGraph}
import org.apache.spark.sql.functions._

/** Link extraction + host-graph rank (q159/q160): normalization
  * semantics on hand-built hazards, the markup round-trip vs a direct
  * token derivation, the skew/dangling properties a content-derived
  * graph must have, and the integer fixpoint vs a driver-side replay. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("extraction normalizes scheme case, www prefix, and port; non-href urls ignored") {
    val pages = Seq(
      (1L, "<a href=\"HTTP://www.Foo.Example.com:8080/p0\">x</a> " +
        "<a href=\"https://bar.example.com/p7\">y</a>"),
      // a bare url outside an href must NOT be harvested
      (2L, "no links here http://plain.example.com not an href"),
      (3L, "<a href=\"http://baz.example.com:443/\">z</a>")
    ).toDF("doc_id", "html")
    val got = LinkGraph.extractLinks(pages)
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "foo.example.com"), (1L, "bar.example.com"),
      (3L, "baz.example.com")))
  }

  test("markup round-trip inverts the decoration: extracted links equal the direct token derivation") {
    val docs = Tables.documents(spark, sf)
    val got = LinkGraph.extractLinks(LinkGraph.pages(docs))
      .as[(Long, String)].collect().sorted
    val rows = docs.select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    val srcOf = rows.map(r => r._1 -> r._3).toMap
    val n = rows.length.toLong
    val want = rows.flatMap { case (id, text, _) =>
      text.split(" ").zipWithIndex.collect {
        case (w, i) if i % LinkGraph.LinkEvery == 0 =>
          (id, s"$w.example.com")
      } :+ ((id, s"${srcOf((id + 1) % n)}.example.com")) // pagination link
    }.sorted
    assert(got.sameElements(want))
  }

  test("the extracted host graph is skewed, variable-degree, and has dangling hosts at the floor") {
    val docs = Tables.documents(spark, sf)
    val edges = LinkGraph.hostEdges(docs).as[(String, String)].collect()
    // in-degree skew: content-term frequency, not a regular derivation
    val indeg = edges.groupBy(_._2).map(_._2.size)
    assert(indeg.max > indeg.min,
      s"in-degrees uniform (${indeg.min}) — graph is not content-skewed")
    // word-hosts never link out: dangling nodes exist...
    val srcs = edges.map(_._1).toSet
    val dangling = edges.map(_._2).filterNot(srcs).toSet
    assert(dangling.nonEmpty, "expected dangling word-hosts")
    // ...and every host must sit at/above the teleport floor
    val ranks = LinkGraph.pagerankHosts(spark, docs)
      .as[(String, Long)].collect().toMap
    assert(ranks.values.min >= Graph.Scale * 15 / 100)
    // the pagination ring (r15): every source-host is also LINKED-TO
    // (by its predecessor's pages), so the graph has depth — no
    // source-host sits at the bare floor the r14 diameter-1 graph
    // pinned, and the ring makes every source reachable from any other
    val dsts = edges.map(_._2).toSet
    srcs.foreach(h => assert(dsts.contains(h),
      s"source host $h has no in-link — pagination ring broken"))
    srcs.foreach(h => assert(ranks(h) > Graph.Scale * 15 / 100, h))
  }

  test("the host graph has multi-hop depth: q180 BFS reaches new nodes over many rounds") {
    val docs = Tables.documents(spark, sf)
    val got = LinkGraph.bfsHosts(spark, docs)
      .as[(String, Long)].collect()
    val hist = got.groupBy(_._2).view.mapValues(_.size).toMap
    // every round must have grown the frontier — genuine multi-hop
    // traversal, not the r14 one-hop saturation
    (0L to LinkGraph.HostBfsRounds.toLong).foreach { d =>
      assert(hist.getOrElse(d, 0) > 0, s"no node at dist $d: $hist")
    }
    // and the BFS equals a driver-side replay
    val edges = LinkGraph.hostEdges(docs).as[(String, String)].collect()
    val seed = edges.map(_._1).min
    var dist = Map(seed -> 0L)
    for (r <- 1 to LinkGraph.HostBfsRounds) {
      val nd = edges.filter(e => dist.contains(e._1))
        .groupBy(_._2).map { case (d, es) =>
          d -> (es.map(e => dist(e._1)).min + 1L) }
      dist = (dist.keySet ++ nd.keySet).map { k =>
        k -> math.min(dist.getOrElse(k, Long.MaxValue),
          nd.getOrElse(k, Long.MaxValue))
      }.toMap
    }
    assert(got.toMap == dist)
  }

  test("incremental link-rank: warm rounds contract the stored registry toward the full fixpoint, bit-exact") {
    val docs = Tables.documents(spark, sf)
    val eAll = LinkGraph.hostEdges(docs)
      .as[(String, String)].collect().toSet
    // base = the full-corpus link derivation restricted by src_doc (a
    // page's content is a fact about the page, not about the slice)
    val eBase = LinkGraph.hostEdges(docs,
      pmod($"src_doc", lit(Graph.BatchMod.toLong)) =!= 0L)
      .as[(String, String)].collect().toSet
    assert(eBase.subsetOf(eAll) && eBase != eAll,
      "the doc batch must contribute new distinct edges")
    val nodes = (eAll.map(_._1) ++ eAll.map(_._2)).toSeq
    def rounds(edges: Set[(String, String)], start: Map[String, Long],
               k: Int): Map[String, Long] = {
      val od = edges.toSeq.groupBy(_._1).map { case (s, es) => s -> es.size }
      var r = start
      for (_ <- 1 to k) {
        val inc = edges.toSeq.groupBy(_._2).map { case (d, es) =>
          d -> es.map { case (s, _) => r(s) / od(s) }.sum }
        r = nodes.map(n =>
          n -> (Graph.Scale * 15 / 100 + 85 * inc.getOrElse(n, 0L) / 100)).toMap
      }
      r
    }
    val r0 = nodes.map(_ -> Graph.Scale).toMap
    val fix = rounds(eAll, r0, 10) // converged-enough reference
    def dist(m: Map[String, Long]): Long =
      m.map { case (k, v) => math.abs(v - fix(k)) }.sum
    val stored = rounds(eBase, r0, Graph.Iterations)
    val got = LinkGraph.pagerankHostsIncremental(spark, docs)
      .as[(String, Long)].collect().toMap
    assert(dist(stored) > 0, "stored registry should differ from the new fixpoint")
    assert(dist(got) < dist(stored), s"warm=${dist(got)} stored=${dist(stored)}")
    // and the two-phase drive is bit-exact vs the driver-side replay
    assert(got == rounds(eAll, stored, Graph.IncrRounds))
  }

  test("dictionary-encoded host ids rank identically — the stringly-keys-to-dense-longs scale path") {
    // SCALE.md's q160 claim: at real scale the string keys are killed
    // first (distinct + surrogate pass), after which the q153 bucketed
    // layout applies unchanged. Pin the result-identity of that encode:
    // rank over dense long ids, decode, compare bit-for-bit.
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val edges = LinkGraph.hostEdges(docs).localCheckpoint()
    val hosts = edges.select($"src".as("host"))
      .unionByName(edges.select($"dst".as("host"))).distinct()
    // global window is fine in a TEST on a host dictionary this small;
    // production uses the q20 surrogate pipeline (range-partitioned)
    val ids = hosts.withColumn("hid",
      row_number().over(Window.orderBy($"host")).cast("long"))
      .localCheckpoint()
    val eIds = edges
      .join(ids.select($"host".as("src"), $"hid".as("src_id")), "src")
      .join(ids.select($"host".as("dst"), $"hid".as("dst_id")), "dst")
      .select($"src_id".as("src"), $"dst_id".as("dst"))
    val e = eIds.join(
      eIds.groupBy($"src").agg(count(lit(1)).as("od")), "src")
    val nodes = eIds.select($"src".as("node"))
      .unionByName(eIds.select($"dst".as("node"))).distinct()
    val r0 = nodes.select($"node", lit(Graph.Scale).as("r"))
    val encoded = (1 to Graph.Iterations)
      .foldLeft(r0)((r, _) => LinkGraph.stepVarDeg(nodes, e, r))
      .join(ids.withColumnRenamed("hid", "node"), "node")
      .select($"host", $"r").as[(String, Long)].collect().toMap
    val direct = LinkGraph.pagerankHosts(spark, docs)
      .as[(String, Long)].collect().toMap
    assert(encoded == direct)
  }

  test("url canonicalization: hazards undone, non-defaults preserved, idempotent") {
    val cases = Seq(
      // every planted hazard at once
      ("HTTP://WWW.Ex.COM:80/A/B?utm_source=x&b=2&a=1#frag",
        "http://ex.com/A/B?a=1&b=2"),
      // https default port strips; http's does not apply to https
      ("HTTPS://ex.com:443/p?gclid=1&fbclid=2", "https://ex.com/p"),
      // NON-default port must survive (https on :80 is a real, odd port)
      ("https://ex.com:80/p", "https://ex.com:80/p"),
      ("http://ex.com:8080/p?z=1&y=2", "http://ex.com:8080/p?y=2&z=1"),
      // path case preserved; no query, no fragment
      ("http://Ex.com/CaseSensitive/Path", "http://ex.com/CaseSensitive/Path"),
      // already canonical → unchanged (idempotence on the fixed point)
      ("http://ex.com/p?a=1&b=2", "http://ex.com/p?a=1&b=2"),
      // percent-encoding: unreserved escapes decode (%7e → ~, %2d → -,
      // %2e → ., %5f → _, any hex case); reserved ones only uppercase
      ("http://ex.com/a%7eb%2dc%2e%5f?k=%3a1", "http://ex.com/a~b-c._?k=%3A1"),
      // a malformed bare % (no two hex digits) passes through untouched
      ("http://ex.com/100%z", "http://ex.com/100%z")
    )
    val got = cases.map(_._1).toDF("url")
      .select(LinkGraph.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
    // idempotence over the whole case set: canon(canon(u)) == canon(u)
    val twice = cases.map(_._2).toDF("url")
      .select(LinkGraph.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(twice == cases.map(_._2))
  }

  test("scheme-less inputs are non-canonicalizable (NULL), never a path-only key") {
    // the r14 hazard: '//cdn.ex.com/lib.js' canonicalized to a PATH-ONLY
    // key that collided across hosts; now every non-absolute input
    // surfaces as NULL from the context-free form
    val hazards = Seq("//cdn.ex.com/lib.js", "/relative/path",
      "page.html", "mailto:x@ex.com/no-slashes", "", "ex.com/p")
    val got = hazards.toDF("url")
      .select(LinkGraph.canonicalizeUrl($"url").as("c"))
      .as[Option[String]].collect().toSeq
    assert(got.forall(_.isEmpty), s"expected all NULL, got $got")
    // with the discovering page as context, protocol-relative refs
    // resolve against the page's scheme (RFC 3986 §4.2)...
    val ctx = Seq(
      (("//cdn.Ex.com:443/lib.js", "HTTPS://www.page.com/a"),
        Some("https://cdn.ex.com/lib.js")),
      (("//cdn.ex.com/x", "http://page.com/b"),
        Some("http://cdn.ex.com/x")),
      // ...absolute URLs ignore the context entirely...
      (("HTTP://WWW.Ex.COM:80/A", "https://page.com"),
        Some("http://ex.com/A")),
      // ...and other relative forms stay non-canonicalizable
      (("/relative/path", "http://page.com/b"), None))
    val gotCtx = ctx.map(_._1).toDF("url", "page")
      .select(LinkGraph.canonicalizeUrlFrom($"url", $"page").as("c"))
      .as[Option[String]].collect().toSeq
    assert(gotCtx == ctx.map(_._2))
  }

  test("HITS equals a driver-side integer replay; the shift bounds growth without reordering") {
    val docs = Tables.documents(spark, sf)
    val edges = LinkGraph.hostEdges(docs).as[(String, String)].collect().toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq
    var h = nodes.map(_ -> LinkGraph.HitsH0).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to LinkGraph.HitsRounds) {
      val ain = edges.toSeq.groupBy(_._2)
        .map { case (d, es) => d -> es.map(e => h(e._1)).sum }
      a = nodes.map(n => n -> ain.getOrElse(n, 0L)).toMap
      val hout = edges.toSeq.groupBy(_._1)
        .map { case (s, es) => s -> es.map(e => a(e._2)).sum }
      h = nodes.map(n =>
        n -> (hout.getOrElse(n, 0L) >> LinkGraph.HitsShift)).toMap
    }
    val got = LinkGraph.hitsHosts(spark, docs)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == nodes.map(n => n -> ((h(n), a(n)))).toMap)
    // structure: word-hosts never emit links (hub 0, auth > 0);
    // source-hosts emit AND — via the pagination ring — receive
    // (hub > 0, auth > 0)
    val srcs = edges.map(_._1)
    srcs.foreach { s => assert(got(s)._1 > 0L && got(s)._2 > 0L, s) }
    (nodes.toSet -- srcs).foreach { w =>
      assert(got(w)._1 == 0L && got(w)._2 > 0L, w)
    }
    // the shift keeps scores in a fixed band: after 4 rounds the hub
    // mass is within ~2 doublings of h0 instead of ×(d_in·d_out)^4
    assert(got.values.map(_._1).max < LinkGraph.HitsH0 * 32,
      "shift failed to bound hub growth")
    // CORPUS-LEVEL regression check on the ranking: on THIS graph the
    // shifted run orders every strictly-ordered pair the same way as
    // the unshifted (r14) run. Per-round shifting is monotone, but
    // truncation losses compound ACROSS rounds, so strict-order
    // inversions are possible in principle on other graphs (ADVICE r15
    // #2) — this pins the generator's current outcome, not a theorem;
    // if the corpus generator changes and a pair separated by less
    // than the accumulated truncation error flips, weaken to a
    // tolerance band rather than chasing exactness.
    val e = LinkGraph.hostEdges(docs).localCheckpoint()
    val raw = LinkGraph.hitsLoop(e, LinkGraph.HitsRounds, 0)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    for (x <- nodes; y <- nodes) {
      if (got(x)._1 > got(y)._1)
        assert(raw(x)._1 > raw(y)._1, s"hub inversion: $x vs $y")
      if (got(x)._2 > got(y)._2)
        assert(raw(x)._2 > raw(y)._2, s"auth inversion: $x vs $y")
    }
  }

  test("anchor pairs: positives are index entries, negatives never collide with a true pair, <= NegK draws each") {
    val docs = Tables.documents(spark, sf)
    val pg = LinkGraph.pages(docs).localCheckpoint()
    val idx = LinkGraph.anchorContext(pg)
      .as[(String, String, Long)].collect() // (dst_host, term, n_links)
      .map(r => (r._2, r._1) -> r._3).toMap
    val got = LinkGraph.anchorPairs(pg)
      .as[(String, String, Long, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, h, n, i, nh) =>
      assert(idx((t, h)) == n, s"positive ($t, $h) not an index entry")
      assert(!idx.contains((t, nh)),
        s"false negative survived: ($t, $nh) is a true index pair")
      assert(i >= 0 && i < Graph.NegK)
    }
    // exactly-once by (term, host, i); each positive keeps at most NegK
    // draws, and the accidental-hit drop is not degenerate (most draws
    // survive on a dictionary-sized host universe)
    assert(got.map(r => (r._1, r._2, r._4)).distinct.length == got.length)
    val perPos = got.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    assert(perPos.values.forall(_ <= Graph.NegK))
    // the catalog corpus' index is DENSE (dictionary-sized host
    // universe, most terms label many hosts), so most draws land on
    // true pairs and drop — at web scale density is tiny and survival
    // near-total. Only guard against a fully-degenerate hash here.
    assert(got.length * 10 > idx.size * Graph.NegK,
      "under 10% of negative draws survived — hash degenerate")
  }

  test("host rank equals a driver-side integer replay, bit for bit") {
    val docs = Tables.documents(spark, sf)
    val edges = LinkGraph.hostEdges(docs).as[(String, String)].collect().toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq
    val od = edges.toSeq.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to Graph.Iterations) {
      val inc = edges.toSeq.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / od(s) }.sum }
      r = nodes.map(n =>
        n -> (Graph.Scale * 15 / 100 + 85 * inc.getOrElse(n, 0L) / 100)).toMap
    }
    val got = LinkGraph.pagerankHosts(spark, docs)
      .as[(String, Long)].collect().toMap
    assert(got == r)
  }

  test("corpus tokens are [a-z0-9]+ — the anchor-context term charset assumption") {
    // q181's context regex classes the preceding token as [a-z0-9]+ so
    // an anchor's </a> tail can never masquerade as a term; that is
    // sound only while corpus tokens stay in that charset.
    val bad = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
      .filter(!$"w".rlike("^[a-z0-9]+$")).count()
    assert(bad == 0L)
  }

  test("anchor context: token-0 and anchor-preceded pagination anchors have no context; others harvest the preceding word") {
    // doc 0: 8 tokens → anchors at 0 (no context) and 7 (context eta);
    //   last token IS the anchor at 7, so doc 0's pagination anchor is
    //   preceded by '</a>' and harvests NO context.
    // doc 1: 9 tokens → anchors at 0 (no context) and 7 (context
    //   seven); last token 'nine' is plain, so the pagination anchor
    //   (→ successor doc 0's host) harvests 'nine'.
    val docs = Seq(
      (0L, "s0", "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "s1", "one two three four five six seven eight nine")
    ).toDF("doc_id", "source", "text")
    val got = LinkGraph.anchorContext(LinkGraph.pages(docs))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("theta.example.com", "eta", 1L),
      ("eight.example.com", "seven", 1L),
      ("s0.example.com", "nine", 1L)))
  }

  test("anchor BM25: ranks are dense and ordered, positive scores only for hosts whose anchor contexts carry a query term") {
    val docs = Tables.documents(spark, sf)
    val pg = LinkGraph.pages(docs)
    val top = LinkGraph.anchorBm25(pg)
      .as[(String, Double, Int)].collect()
    assert(top.nonEmpty && top.length <= graft.operators.TextAnalysis.Bm25TopK)
    assert(top.map(_._3).sorted.sameElements(1 to top.length), "ranks not dense")
    assert(top.sortBy(_._3).map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)), "scores not descending with rank")
    val ctx = LinkGraph.anchorContext(pg)
      .as[(String, String, Long)].collect()
    val qt = graft.operators.TextAnalysis.Bm25Query.toSet
    val hostsWithTerm = ctx.filter(r => qt.contains(r._2)).map(_._1).toSet
    top.filter(_._2 > 0).foreach { case (h, s, _) =>
      assert(hostsWithTerm.contains(h),
        s"host $h scored $s without any query term in its anchor contexts")
    }
    assert(top.exists(_._2 > 0), "no host scored — query terms absent from corpus")
  }

  test("maintained anchor index (base counts + batch fold) equals the full rebuild exactly") {
    val docs = Tables.documents(spark, sf)
    val pg = LinkGraph.pages(docs)
    val full = LinkGraph.anchorContext(pg)
      .as[(String, String, Long)].collect().toSet
    val base = LinkGraph.anchorContextRaw(pg)
      .filter($"src_doc" % 10 =!= 0)
      .groupBy($"dst_host", $"term").agg(count(lit(1)).as("n_links"))
    val batch = LinkGraph.anchorContextRaw(pg)
      .filter($"src_doc" % 10 === 0)
      .groupBy($"dst_host", $"term").agg(count(lit(1)).as("n_links"))
    val maintained = base.unionByName(batch)
      .groupBy($"dst_host", $"term").agg(sum($"n_links").as("n_links"))
      .as[(String, String, Long)].collect().toSet
    assert(maintained == full)
    // the fold is live: both sides contribute rows
    assert(base.count() > 0 && batch.count() > 0)
  }

  test("politeness schedule: per-host slots are a contiguous 1..k queue, host ranks are the (priority desc, host) order") {
    val docs = Tables.documents(spark, sf)
    val rows = graft.operators.Crawl.politenessSchedule(docs)
      .as[(String, String, Long, Long, Long)].collect()
    // (canon_url, dst_host, priority, host_rank, slot)
    val byHost = rows.groupBy(_._2)
    byHost.foreach { case (h, rs) =>
      assert(rs.map(_._5).sorted.sameElements(1L to rs.size.toLong),
        s"host $h slots not a contiguous FIFO queue")
      assert(rs.map(_._4).distinct.length == 1, s"host $h rank not constant")
      // slot order follows the canonical URL order (FIFO determinism)
      assert(rs.sortBy(_._5).map(_._1).sameElements(rs.map(_._1).sorted),
        s"host $h queue order is not the canon_url order")
    }
    val hosts = byHost.map { case (h, rs) => (rs.head._3, h, rs.head._4) }
    val wantOrder = hosts.toSeq.sortBy { case (p, h, _) => (-p, h) }
    assert(wantOrder.map(_._3).sameElements(1L to hosts.size.toLong),
      "host_rank is not the (priority desc, host asc) dense order")
  }

  test("trustrank: seed-biased teleport — non-seed trust is pure propagation, seeds hold the floor, and the gate splits the hosts") {
    val docs = Tables.documents(spark, sf)
    val got = LinkGraph.trustrankHosts(spark, docs)
      .as[(String, Long, Long)].collect() // (node, seed, t)
    val (seeds, rest) = got.partition(_._2 == 1L)
    // the LM-quality mean gate must produce a PROPER seed subset — a
    // degenerate all-or-nothing gate would make this entry PageRank
    // or the zero vector
    assert(seeds.nonEmpty && rest.nonEmpty,
      s"degenerate seed gate: ${seeds.length} seeds of ${got.length}")
    // every seed keeps at least the biased teleport floor
    val floor = Graph.Scale * 15 / 100
    seeds.foreach { case (n, _, t) =>
      assert(t >= floor, s"seed $n below the teleport floor: $t")
    }
    // driver-side integer replay (the q160 test's discipline, with the
    // seed-biased update): same edges, same DIV arithmetic
    val e = LinkGraph.hostEdges(docs).as[(String, String)].collect()
    val od = e.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val seedSet = seeds.map(_._1).toSet
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var t = nodes.map(n =>
      n -> (if (seedSet(n)) Graph.Scale else 0L)).toMap
    (1 to Graph.Iterations).foreach { _ =>
      val inc = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      e.foreach { case (s, d) => inc(d) += t(s) / od(s) }
      t = nodes.map { n =>
        n -> ((if (seedSet(n)) floor else 0L) + 85L * inc(n) / 100L)
      }.toMap
    }
    got.foreach { case (n, _, tv) =>
      assert(tv == t(n), s"trust mismatch at $n: engine $tv vs replay ${t(n)}")
    }
  }

  test("robots exclusion: all three verdict branches fire, longest match wins, pagination URLs default-allow") {
    val docs = Tables.documents(spark, sf)
    val canon = graft.operators.Crawl.canonFrontier(docs)
    val rows = graft.operators.Crawl.robotsVerdicts(canon)
      .as[(String, String, Boolean, Option[String], Option[Boolean])]
      .collect()
    assert(rows.length == canon.count(), "one verdict per URL")
    val defaults = rows.filter(_._4.isEmpty)
    val disallowed = rows.filter(r => r._4.nonEmpty && !r._3)
    val allowOverrides = rows.filter(r => r._4.nonEmpty && r._3)
    // the synthesized rule set must exercise every branch, or the
    // oracle hash proves less than it claims
    assert(defaults.nonEmpty && disallowed.nonEmpty && allowOverrides.nonEmpty,
      s"degenerate branches: ${defaults.length}/${disallowed.length}/" +
        s"${allowOverrides.length}")
    defaults.foreach { r =>
      assert(r._3, s"${r._1}: no rule matched but not fetchable")
    }
    // /next pagination URLs can never match a /p rule
    rows.filter(_._1.endsWith("/next")).foreach { r =>
      assert(r._4.isEmpty && r._3, s"${r._1} matched a /p rule")
    }
    // longest-match: a fetchable URL with a matched ALLOW rule must
    // also prefix-match its host's shorter disallow rule
    allowOverrides.foreach { r =>
      val path = r._1.replaceFirst("^[a-z]+://[^/]+", "")
      val dis = "/p" + (r._2.length % 10)
      assert(path.startsWith(dis),
        s"${r._1}: allow fired without the shorter disallow matching")
      assert(r._4.get.startsWith(dis) && r._4.get.length > dis.length,
        s"${r._1}: allow rule is not the longer override")
    }
  }

  test("spam mass: thousandths in [0,1000], exact formula over the row's own vectors, untrusted hosts score full mass") {
    val docs = Tables.documents(spark, sf)
    val rows = LinkGraph.spamMassHosts(spark, docs)
      .as[(String, Long, Long, Long, Long)].collect()
    // (node, seed, r, t, spam_milli)
    val sp = rows.map(_._3).sum
    val st = rows.map(_._4).sum
    assert(st > 0, "mean gate must admit at least the max host")
    rows.foreach { case (n, _, r, t, m) =>
      assert(m >= 0L && m <= 1000L, s"$n spam_milli out of range: $m")
      val rt = t * sp / st
      val want = math.max(0L, 1000L - (1000L * rt) / r)
      assert(m == want, s"$n spam formula drifted: engine $m vs $want")
      if (t == 0L) assert(m == 1000L,
        s"$n gets no trust but spam mass $m < 1000")
    }
  }
}
