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
    val want = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        text.split(" ").zipWithIndex.collect {
          case (w, i) if i % LinkGraph.LinkEvery == 0 =>
            (id, s"$w.example.com")
        }
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
    // ...and every dangling host must sit exactly at the teleport floor
    // plus its damped incoming mass — never below the floor
    val ranks = LinkGraph.pagerankHosts(spark, docs)
      .as[(String, Long)].collect().toMap
    assert(ranks.values.min >= Graph.Scale * 15 / 100)
    // source-hosts have out-links only (nobody links to a source host),
    // so after round 1 they are AT the floor exactly
    val srcOnly = srcs -- edges.map(_._2).toSet
    assert(srcOnly.nonEmpty)
    srcOnly.foreach(h => assert(ranks(h) == Graph.Scale * 15 / 100, h))
  }

  test("incremental link-rank: warm rounds contract the stored registry toward the full fixpoint, bit-exact") {
    val docs = Tables.documents(spark, sf)
    val eAll = LinkGraph.hostEdges(docs)
      .as[(String, String)].collect().toSet
    val eBase = LinkGraph.hostEdges(
      docs.filter(pmod($"doc_id", lit(Graph.BatchMod.toLong)) =!= 0L))
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
      ("http://ex.com/p?a=1&b=2", "http://ex.com/p?a=1&b=2")
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

  test("HITS equals a driver-side integer replay; hubs are sources, authorities are words") {
    val docs = Tables.documents(spark, sf)
    val edges = LinkGraph.hostEdges(docs).as[(String, String)].collect().toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq
    var h = nodes.map(_ -> 1L).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to LinkGraph.HitsRounds) {
      val ain = edges.toSeq.groupBy(_._2)
        .map { case (d, es) => d -> es.map(e => h(e._1)).sum }
      a = nodes.map(n => n -> ain.getOrElse(n, 0L)).toMap
      val hout = edges.toSeq.groupBy(_._1)
        .map { case (s, es) => s -> es.map(e => a(e._2)).sum }
      h = nodes.map(n => n -> hout.getOrElse(n, 0L)).toMap
    }
    val got = LinkGraph.hitsHosts(spark, docs)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == nodes.map(n => n -> ((h(n), a(n)))).toMap)
    // structure: source-hosts never receive links (auth 0, hub > 0);
    // word-hosts never emit them (hub 0, auth > 0)
    val srcs = edges.map(_._1)
    srcs.foreach { s => assert(got(s)._2 == 0L && got(s)._1 > 0L, s) }
    (nodes.toSet -- srcs).foreach { w =>
      assert(got(w)._1 == 0L && got(w)._2 > 0L, w)
    }
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
}
