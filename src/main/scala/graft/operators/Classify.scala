package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained-in-engine document classification — the fastText-style model
  * step every production curation pipeline runs (CCNet / DCLM quality and
  * domain classifiers): TRAIN a model from a labelled split of the corpus
  * as aggregates, broadcast it, and APPLY it to the rest — all inside the
  * engine, no model server. The catalog's existing quality/lang entries
  * (q52, q89) are FIXED heuristics; this is the supervised counterpart
  * with a real train/apply lifecycle.
  *
  * Model: multinomial Naive Bayes with Laplace smoothing. Training is pure
  * counting — one map-side-combined `groupBy(label, word)` shuffle of the
  * training half — so the "model" is a DataFrame of log-likelihoods over
  * the COMPLETE vocab × class grid (missing (label, word) cells get the
  * smoothed floor via a left join against the grid, not a scoring-time
  * special case). Priors are doc counts. Scoring joins each test token to
  * the broadcast grid (|vocab| · |classes| rows — KBs here, and capped by
  * a min-df vocab gate at real scale) and sums per (doc, label): the test
  * corpus is never shuffled except the per-doc partial-agg of scores keyed
  * by doc_id. Argmax is a window over the ≤|classes| scored rows per doc,
  * ordered on the ROUNDED score with the label as the deterministic
  * tie-break — rounding first means both engines rank identical values
  * (raw log-sums agree only to ~1e-12 across sum orders).
  *
  * Numeric contract with the oracle: every probability is a ratio of
  * integers (IEEE division is correctly rounded, so both engines get the
  * same double), `ln` of that double differs by ≤1 ulp between libm
  * implementations, and scores are sums of a few hundred such terms —
  * agreement to ~1e-12, rounded at 1e-6 before any comparison.
  *
  * Honest note on THIS corpus: the synthetic generator draws every
  * document's words from one shared 31-word vocabulary independent of
  * `lang`, so there is no class signal to learn and the confusion matrix
  * concentrates on the prior-dominant class. The entry certifies the
  * train/broadcast/apply mechanics and their exact numerics — accuracy
  * statements need a corpus whose classes differ.
  *
  * At 100 TB: vocab is gated by min document frequency (the standard knob
  * — here the full 31-word vocab passes any gate), the grid stays
  * broadcastable (10^5 vocab × 10^2 classes · 8B ≈ 100 MB worst case,
  * above which production hashes features — q117's vocab-encode path),
  * and train + score are each a single shuffle whose width is token
  * COUNTS, not text.
  */
object Classify extends QueryPack {

  /** Decimal places scores are rounded to before ranking. */
  val Round = 6

  /** Tokenized docs: (doc_id, lang, train, w), one row per token. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        (col("doc_id") % 2 === 0).as("train"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)

  /** Confusion matrix (actual, predicted, n) of NB trained on even
    * doc_ids and applied to odd ones.
    *
    * Convention: a test doc with ZERO in-vocab tokens has no score rows
    * (the token⋈grid join is inner) and is excluded from the matrix —
    * the oracle shares the convention, and ClassifySpec asserts the
    * matrix partitions the test split, so any silent drop would fail
    * there. At real scale the min-df vocab gate makes this the
    * empty-document case; a deployment that must route such docs
    * predicts the prior argmax in a trivial follow-up union. */
  def nbConfusion(docs: DataFrame): DataFrame = nbConfusion(docs, minDf = 1)

  /** As [[nbConfusion]], with the vocab gated to words appearing in at
    * least `minDf` distinct TRAINING documents — the knob that bounds
    * the broadcast grid at corpus scale (the catalog entry runs minDf=1
    * so the oracle stays a plain replay; ClassifySpec exercises a
    * biting gate). Gated-out words drop from BOTH training mass and
    * scoring, exactly as if they'd never been tokenized. */
  def nbConfusion(docs: DataFrame, minDf: Int): DataFrame = {
    val tok0 = tokens(docs)
    val gated =
      if (minDf <= 1) tok0
      else {
        val kept = tok0.filter(col("train"))
          .groupBy(col("w"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= minDf)
          .select(col("w"))
        tok0.join(broadcast(kept), Seq("w"), "left_semi")
      }
    val tok = gated
    val trainTok = tok.filter(col("train"))

    // Priors: ln(docs-in-class / training docs), from integer counts.
    val trainDocs = docs.filter(col("doc_id") % 2 === 0)
    val nTrain = trainDocs.agg(count(lit(1)).as("nt"))
    val priors = trainDocs.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(nTrain))
      .select(col("lang"), log(col("nd").cast("double") / col("nt")).as("prior"))

    // Complete vocab × class grid with Laplace-smoothed log-likelihoods:
    // ln((cnt + 1) / (classTokens + |vocab|)).
    val vocab = trainTok.select(col("w")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val classes = trainTok.select(col("lang")).distinct()
    val wc = trainTok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
    val classTok = trainTok.groupBy(col("lang")).agg(count(lit(1)).as("tw"))
    val grid = vocab.crossJoin(classes)
      .join(wc, Seq("lang", "w"), "left")
      .join(classTok, Seq("lang"))
      .crossJoin(broadcast(vSize))
      .select(col("lang").as("clazz"), col("w"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("tw") + col("v"))).as("ll"))

    // Score every test doc against every class; out-of-vocab test tokens
    // drop out of the inner join (the standard convention).
    val scores = tok.filter(!col("train"))
      .join(broadcast(grid), Seq("w"))
      .groupBy(col("doc_id"), col("lang"), col("clazz"))
      .agg(sum(col("ll")).as("tokscore"))
      .join(broadcast(priors).withColumnRenamed("lang", "clazz"), Seq("clazz"))
      .select(col("doc_id"), col("lang"),
        col("clazz"), round(col("prior") + col("tokscore"), Round).as("score"))

    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("clazz").asc)
    scores.withColumn("rk", row_number().over(win))
      .filter(col("rk") === 1)
      .groupBy(col("lang").as("actual"), col("clazz").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  def queries: Map[String, Q] = Map(
    "q155_nb_classifier" -> Q(
      (s, d) => nbConfusion(T.documents(s, d)),
      Some(s"""
        WITH tok AS (
          SELECT doc_id, lang, doc_id % 2 = 0 AS train,
                 unnest(string_split(text, ' ')) AS w
          FROM documents
        ),
        ttok AS (SELECT * FROM tok WHERE train AND len(w) > 0),
        nt AS (SELECT count(*) AS nt FROM documents WHERE doc_id % 2 = 0),
        priors AS (
          SELECT lang, ln(CAST(count(*) AS DOUBLE) / nt) AS prior
          FROM documents CROSS JOIN nt WHERE doc_id % 2 = 0 GROUP BY lang, nt
        ),
        vocab AS (SELECT DISTINCT w FROM ttok),
        vs AS (SELECT count(*) AS v FROM vocab),
        classes AS (SELECT DISTINCT lang FROM ttok),
        wc AS (SELECT lang, w, count(*) AS cnt FROM ttok GROUP BY 1, 2),
        ctok AS (SELECT lang, count(*) AS tw FROM ttok GROUP BY 1),
        grid AS (
          SELECT classes.lang AS clazz, vocab.w,
                 ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE) / (tw + v)) AS ll
          FROM vocab CROSS JOIN classes
          LEFT JOIN wc ON wc.lang = classes.lang AND wc.w = vocab.w
          JOIN ctok ON ctok.lang = classes.lang
          CROSS JOIN vs
        ),
        scores AS (
          SELECT t.doc_id, t.lang, g.clazz,
                 round(any_value(p.prior) + sum(g.ll), $Round) AS score
          FROM tok t
          JOIN grid g ON g.w = t.w
          JOIN priors p ON p.lang = g.clazz
          WHERE NOT t.train AND len(t.w) > 0
          GROUP BY t.doc_id, t.lang, g.clazz
        ),
        pred AS (
          SELECT doc_id, lang, clazz,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, clazz ASC) AS rk
          FROM scores
        )
        SELECT lang AS actual, clazz AS predicted, count(*) AS n
        FROM pred WHERE rk = 1 GROUP BY 1, 2
      """.stripMargin),
      doc = "Multinomial NB trained in-engine on the even-doc_id half " +
        "(counting = one shuffle), broadcast vocab-x-class grid, scored " +
        "on the odd half, rounded-argmax confusion matrix")
  )
}
