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
}
