package graft

import graft.operators.NgramLm
import org.apache.spark.sql.DataFrame

/** Stupid-backoff trigram LM (q162): a driver-side replay of the exact
  * Brants chain (ratios + 0.4/0.16 literals + add-1 unigram floor),
  * a hand corpus that reaches every backoff level including the
  * unseen-word floor, and the live-backoff property on the sf corpus. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  /** The same chain in plain Scala: per held-out doc, (n, nTri, nBi,
    * nUni, mean log2 s) — unrounded. */
  private def replay(train: Seq[Seq[String]], test: Seq[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long, Long, Double)] = {
    def grams(ws: Seq[String], n: Int): Seq[Seq[String]] =
      if (ws.length < n) Nil else ws.sliding(n).toSeq
    val uni = train.flatten.groupBy(identity).map { case (w, g) => w -> g.size }
    val bi = train.flatMap(grams(_, 2)).groupBy(identity)
      .map { case (g, o) => (g(0), g(1)) -> o.size }
    val tri = train.flatMap(grams(_, 3)).groupBy(identity)
      .map { case (g, o) => (g(0), g(1), g(2)) -> o.size }
    val n = train.map(_.size).sum
    val v = uni.size
    test.map { case (id, ws) =>
      val scored = grams(ws, 3).map { g =>
        val (w1, w2, w3) = (g(0), g(1), g(2))
        tri.get((w1, w2, w3)) match {
          case Some(c3) => ("tri", c3.toDouble / bi((w1, w2)))
          case None => bi.get((w2, w3)) match {
            case Some(c2) => ("bi", 0.4 * c2.toDouble / uni(w2))
            case None =>
              ("uni", 0.16 * (uni.getOrElse(w3, 0) + 1).toDouble / (n + v))
          }
        }
      }
      val lg = scored.map(s => math.log(s._2) / math.log(2.0))
      id -> (scored.size.toLong,
        scored.count(_._1 == "tri").toLong,
        scored.count(_._1 == "bi").toLong,
        scored.count(_._1 == "uni").toLong,
        lg.sum / lg.size)
    }.toMap
  }

  private def collect(df: DataFrame): Map[Long, (Long, Long, Long, Long, Double)] =
    df.as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  test("hand corpus reaches every backoff level, incl. the unseen-word add-1 floor") {
    val docs = Seq(
      (1L, "a b c a b c a b d"), // train
      (2L, "b c a"),             // train
      (10L, "a b c x q q a b")   // held out: tri hit, unseen bigrams,
                                 //  unseen WORDS x/q → +1 floor
    ).toDF("doc_id", "text")
    val got = collect(NgramLm.stupidBackoffScore(spark, docs))
    val want = replay(
      Seq("a b c a b c a b d".split(" ").toSeq, "b c a".split(" ").toSeq),
      Seq((10L, "a b c x q q a b".split(" ").toSeq)))
    assert(got.keySet == want.keySet)
    val (gn, gt, gb, gu, ga) = got(10L)
    val (wn, wt, wb, wu, wa) = want(10L)
    assert((gn, gt, gb, gu) == ((wn, wt, wb, wu)))
    assert(gu > 0, "unseen-word floor never fired — hand corpus broken")
    assert(gt > 0 && gb + gu > 0, "backoff chain not exercised")
    // got's avg is Spark-rounded at 3dp; half-bucket tolerance
    assert(math.abs(ga - wa) < 6e-4)
  }

  test("sf corpus: levels and scores equal the driver-side replay; backoff is live") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val train = docs.filter(_._1 % 10 != 0).map(_._2.split(" ").toSeq).toSeq
    val test = docs.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id, t.split(" ").toSeq) }.toSeq
    val want = replay(train, test)
    val got = collect(NgramLm.stupidBackoffScore(spark, Tables.documents(spark, sf)))
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, t, b, u, a)) =>
      val (wn, wt, wb, wu, wa) = want(id)
      assert((n, t, b, u) == ((wn, wt, wb, wu)), s"doc $id level counts")
      assert(math.abs(a - wa) < 6e-4, s"doc $id score $a vs $wa")
    }
    // the chain must be LIVE on this corpus, not vacuously all-trigram
    assert(got.values.map(_._2).sum > 0, "no trigram hits")
    assert(got.values.map(_._3).sum > 0, "backoff never fired")
  }

  /** The q183 fixed-point Kneser–Ney chain in plain Scala — every floor
    * division in the same order as the Spark/DuckDB twins, so integer
    * fields must match EXACTLY. Returns per doc (n, nFull, nMid, nCont,
    * pSum, mean log2(p/S) unrounded). */
  private def knReplay(train: Seq[Seq[String]], test: Seq[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long, Long, Long, Double)] = {
    val S = NgramLm.KnScale
    def grams(ws: Seq[String], n: Int): Seq[Seq[String]] =
      if (ws.length < n) Nil else ws.sliding(n).toSeq
    val bi = train.flatMap(grams(_, 2)).groupBy(identity)
      .map { case (g, o) => (g(0), g(1)) -> o.size.toLong }
    val tri = train.flatMap(grams(_, 3)).groupBy(identity)
      .map { case (g, o) => (g(0), g(1), g(2)) -> o.size.toLong }
    val ctx3 = tri.keys.groupBy(t => (t._1, t._2)).map { case (k, g) => k -> g.size.toLong }
    val kn23 = tri.keys.groupBy(t => (t._2, t._3)).map { case (k, g) => k -> g.size.toLong }
    val kn2 = tri.keys.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
    val knmid = kn23.keys.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val pcj = bi.keys.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
    val nbig = bi.size.toLong
    test.map { case (id, ws) =>
      val scored = grams(ws, 3).map { g =>
        val (w1, w2, w3) = (g(0), g(1), g(2))
        val pc = math.max(pcj.getOrElse(w3, 0L) * S / nbig, 1L)
        val p2 = kn2.get(w2) match {
          case Some(cknsum) =>
            math.max(4L * kn23.getOrElse((w2, w3), 0L) - 3L, 0L) * S / (4L * cknsum) +
              3L * knmid.getOrElse(w2, 0L) * pc / (4L * cknsum)
          case None => pc
        }
        val (lvl, p3) = bi.get((w1, w2)) match {
          case Some(c2) =>
            ("full",
              math.max(4L * tri.getOrElse((w1, w2, w3), 0L) - 3L, 0L) * S / (4L * c2) +
                3L * ctx3.getOrElse((w1, w2), 0L) * p2 / (4L * c2))
          case None => (if (kn2.contains(w2)) "mid" else "cont", p2)
        }
        (lvl, math.max(p3, 1L))
      }
      val lg = scored.map(s => math.log(s._2.toDouble / S) / math.log(2.0))
      id -> (scored.size.toLong,
        scored.count(_._1 == "full").toLong,
        scored.count(_._1 == "mid").toLong,
        scored.count(_._1 == "cont").toLong,
        scored.map(_._2).sum,
        lg.sum / lg.size)
    }.toMap
  }

  private def knCollect(df: DataFrame): Map[Long, (Long, Long, Long, Long, Long, Double)] =
    df.as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6, t._7))).toMap

  test("Kneser-Ney hand corpus reaches full, mid, and cont levels with exact integer scores") {
    val docs = Seq(
      (1L, "a b c a b c a b d"),
      (2L, "b c a"),
      (10L, "a b c x q q a b") // (a,b,·)=full, (q,a,b)=mid via middle-a
                               // trigrams, (c,x,·)/(x,q,·)/(q,q,·)=cont
    ).toDF("doc_id", "text")
    val got = knCollect(NgramLm.knDocScores(docs))
    val want = knReplay(
      Seq("a b c a b c a b d".split(" ").toSeq, "b c a".split(" ").toSeq),
      Seq((10L, "a b c x q q a b".split(" ").toSeq)))
    assert(got.keySet == want.keySet)
    val (gn, gf, gm, gc, gp, ga) = got(10L)
    val (wn, wf, wm, wc, wp, wa) = want(10L)
    assert((gn, gf, gm, gc, gp) == ((wn, wf, wm, wc, wp)))
    assert(gf > 0 && gm > 0 && gc > 0,
      "hand corpus must light every interpolation level")
    assert(math.abs(ga - wa) < 6e-4)
  }

  test("sf corpus: KN integer fields equal the driver-side replay exactly") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = knReplay(
      docs.filter(_._1 % 10 != 0).map(_._2.split(" ").toSeq).toSeq,
      docs.filter(_._1 % 10 == 0)
        .map { case (id, t) => (id, t.split(" ").toSeq) }.toSeq)
    val got = knCollect(NgramLm.knDocScores(Tables.documents(spark, sf)))
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, f, m, c, p, a)) =>
      val (wn, wf, wm, wc, wp, wa) = want(id)
      assert((n, f, m, c, p) == ((wn, wf, wm, wc, wp)), s"doc $id KN fields")
      assert(math.abs(a - wa) < 6e-4, s"doc $id avg_log2p $a vs $wa")
    }
    assert(got.values.map(_._2).sum > 0, "no full-level hits")
  }

  test("KN quality gate keeps exactly the at-or-above-integer-mean set, non-trivially") {
    val docs = Tables.documents(spark, sf)
    val scored = NgramLm.knDocScoresMilli(docs)
      .as[(Long, Long, Long)].collect()
    val tot = scored.map(_._3).sum
    val nd = scored.length.toLong
    val want = scored.filter(r => r._3 * nd >= tot).map(_._1).toSet
    val got = NgramLm.knQualityGate(docs)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < scored.length,
      "gate is vacuous — kept everything or nothing")
  }

  test("modified KN discounts: hand count-of-counts replay exactly; degenerate input falls back to 3/4") {
    val S = NgramLm.KnScale
    // n1..n4 = (4,2,1,1): Y = 4S/8 = S/2, D1 = S - (2·2·Y)//4,
    // D2 = 2S - (3·1·Y)//2, D3 = 3S - (4·1·Y)//1 — all positive
    val y = (4L * S) / (4L + 2L * 2L)
    val got = NgramLm.mknDiscounts(
      Seq((4L, 2L, 1L, 1L)).toDF("n1", "n2", "n3", "n4"))
      .as[(Long, Long, Long)].head()
    assert(got == ((S - (2L * 2L * y) / 4L,
      2L * S - (3L * 1L * y) / 2L,
      3L * S - (4L * 1L * y) / 1L)))
    // a degenerate count-of-counts (all zero) falls back to the fixed
    // d = 3/4 of q183 instead of dividing by zero (KenLM aborts here)
    val fb = NgramLm.mknDiscounts(
      Seq((0L, 0L, 0L, 0L)).toDF("n1", "n2", "n3", "n4"))
      .as[(Long, Long, Long)].head()
    assert(fb == ((3L * S / 4L, 3L * S / 4L, 3L * S / 4L)))
  }

  test("modified KN: identical backoff structure to q183 but the estimated discounts shift the scores") {
    val docs = Tables.documents(spark, sf)
    val fixed = NgramLm.knDocScores(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    val mod = NgramLm.mknDocScores(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(mod.keySet == fixed.keySet)
    // which level fires per token depends only on context EXISTENCE —
    // structural fields must match q183 exactly
    mod.keySet.foreach { id =>
      assert((mod(id)._2, mod(id)._3, mod(id)._4, mod(id)._5) ==
        (fixed(id)._2, fixed(id)._3, fixed(id)._4, fixed(id)._5),
        s"doc $id structure diverged")
    }
    // ... and the discounts BITE: the integer score mass differs from
    // the fixed-d chain for most documents (else q191 restates q183)
    val shifted = mod.keySet.count(id => mod(id)._6 != fixed(id)._6)
    assert(shifted * 2 > mod.size,
      s"only $shifted of ${mod.size} docs shifted under estimated discounts")
  }

  test("per-lang gate: each bucket keeps its own at-or-above-mean set, and the bucketing bites vs the global gate") {
    val docs = Tables.documents(spark, sf)
    val langOf = docs.select($"doc_id", $"lang").as[(Long, String)]
      .collect().toMap
    val scored = NgramLm.docScoresMilli(docs)
      .as[(Long, Long, Long)].collect()
    // driver-side replay of the per-lang integer mean gate
    val byLang = scored.groupBy(r => langOf(r._1))
    val want = byLang.values.flatMap { rs =>
      val tot = rs.map(_._3).sum
      val nd = rs.length.toLong
      rs.filter(r => r._3 * nd >= tot).map(_._1)
    }.toSet
    val got = NgramLm.langQualityGate(docs)
      .as[(Long, String, Long, Long)].collect()
    assert(got.map(_._1).toSet == want)
    got.foreach { case (id, l, _, _) => assert(l == langOf(id)) }
    // every language keeps SOMETHING (the starvation fix — under the
    // global gate a low-scoring language can keep zero docs) and no
    // bucket keeps everything
    byLang.keys.foreach { l =>
      val kept = got.count(_._2 == l)
      assert(kept > 0, s"lang $l starved by its own gate")
      assert(kept < byLang(l).length, s"lang $l gate vacuous")
    }
    // the bucketing BITES: the per-lang kept set differs from the
    // global gate's kept set (else the entry is a restatement of q168)
    val gtot = scored.map(_._3).sum
    val gnd = scored.length.toLong
    val globalKept = scored.filter(r => r._3 * gnd >= gtot).map(_._1).toSet
    assert(want != globalKept,
      "per-lang gate degenerated to the global gate on this corpus")
  }

  test("Moore-Lewis selects exactly the positive-margin set and favors the in-domain language") {
    val docs = Tables.documents(spark, sf)
    val gen = NgramLm.docScoresMilli(docs)
      .select($"doc_id", $"s_milli").as[(Long, Long)].collect().toMap
    val ind = NgramLm.docScoresMilliUnder(
      docs.filter($"doc_id" % 10 =!= 0 && $"lang" === NgramLm.InDomainLang),
      docs).select($"doc_id", $"s_milli").as[(Long, Long)].collect().toMap
    val got = NgramLm.mooreLewisSelect(docs)
      .as[(Long, Long, Long, Long)].collect()
    val wantKept = gen.keySet.filter(id => ind(id) > gen(id))
    assert(got.map(_._1).toSet == wantKept)
    got.foreach { case (id, si, sg, m) =>
      assert(si == ind(id) && sg == gen(id) && m == si - sg && m > 0)
    }
    // the semantic point: in-domain docs must carry a higher mean
    // margin than out-of-domain docs (else the contrast is vacuous)
    val langOf = docs.select($"doc_id", $"lang").as[(Long, String)]
      .collect().toMap
    def meanMargin(p: Long => Boolean): Double = {
      val ms = gen.keys.toSeq.filter(p).map(id => (ind(id) - gen(id)).toDouble)
      ms.sum / ms.size
    }
    val inM = meanMargin(id => langOf(id) == NgramLm.InDomainLang)
    val outM = meanMargin(id => langOf(id) != NgramLm.InDomainLang)
    assert(inM > outM,
      s"in-domain mean margin $inM not above out-of-domain $outM")
  }
}
