package graft

import graft.operators.{Classify, Quality}
import org.apache.spark.sql.functions._

/** NB classifier (q155) and drift PSI (q154) properties: the confusion
  * matrix partitions the test split exactly; a planted-signal corpus is
  * classified perfectly (the model LEARNS when classes differ — the
  * catalog corpus carries no signal, so this is the accuracy evidence);
  * PSI is exactly zero on parity-identical epochs and positive under a
  * planted shift. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("confusion matrix partitions the test split: one prediction per doc") {
    val docs = Tables.documents(spark, sf)
    val conf = Classify.nbConfusion(docs)
    val predicted = conf.agg(sum($"n")).head.getLong(0)
    val testDocs = docs.filter($"doc_id" % 2 === 1).count()
    assert(predicted == testDocs)
    // actual marginals match the test split's class counts
    val byActual = conf.groupBy($"actual").agg(sum($"n").as("n"))
      .as[(String, Long)].collect().toMap
    val want = docs.filter($"doc_id" % 2 === 1).groupBy($"lang")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(byActual == want)
  }

  test("planted disjoint vocab: NB classifies the test split perfectly") {
    val docs = (0L until 40L).map { i =>
      val lang = if (i % 4 < 2) "aa" else "bb"
      val text = if (lang == "aa") "foo foo baz" else "bar bar baz"
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val diag = Classify.nbConfusion(docs)
      .filter($"actual" === $"predicted").agg(sum($"n")).head.getLong(0)
    assert(diag == 20L) // every odd doc_id predicted as its own class
  }

  test("min-df vocab gate: sub-threshold words cannot influence the model") {
    def corpus(rare: String) = (0L until 40L).map { i =>
      val lang = if (i % 4 < 2) "aa" else "bb"
      val base = if (lang == "aa") "foo foo baz" else "bar bar baz"
      // doc 0 is a TRAINING doc (even) carrying a df=1 word
      val text = if (i == 0) s"$base $rare" else base
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    def conf(rare: String) =
      Classify.nbConfusion(corpus(rare), minDf = 2)
        .as[(String, String, Long)].collect().toSet
    // gated out, the rare word's identity is invisible: swapping it
    // changes nothing anywhere in the model or predictions
    assert(conf("zzz") == conf("qqq"))
    // and the gated model still classifies the planted signal perfectly
    val diag = Classify.nbConfusion(corpus("zzz"), minDf = 2)
      .filter($"actual" === $"predicted").agg(sum($"n")).head.getLong(0)
    assert(diag == 20L)
  }

  test("drift PSI is exactly zero when the epochs are identical") {
    // doc_id 2i and 2i+1 share lang and n_chars → na == nb per bucket
    val docs = (0L until 60L).map { i =>
      val k = i / 2
      (i, s"l${k % 3}", 100L + (k % 5) * 64L)
    }.toDF("doc_id", "lang", "n_chars")
    val psi = Quality.driftPsi(docs).select($"psi").as[Double].collect()
    assert(psi.nonEmpty && psi.forall(_ == 0.0))
  }

  test("drift PSI flags a planted epoch shift") {
    // epoch 1 (odd ids) concentrates on one lang; epoch 0 is uniform
    val docs = (0L until 60L).map { i =>
      val lang = if (i % 2 == 1) "hot" else s"l${(i / 2) % 3}"
      (i, lang, 100L)
    }.toDF("doc_id", "lang", "n_chars")
    val hot = Quality.driftPsi(docs)
      .filter($"feature" === "lang" && $"bucket" === "hot")
      .select($"psi").as[Double].head()
    assert(hot > 0.1)
    // the len feature is identical across epochs → zero drift there
    val len = Quality.driftPsi(docs).filter($"feature" === "len")
      .select($"psi").as[Double].collect()
    assert(len.forall(_ == 0.0))
  }
}
