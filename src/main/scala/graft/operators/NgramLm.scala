package graft.operators

import graft.functions.TextOps
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed n-gram language model with STUPID BACKOFF — the
  * web-scale LM of Brants et al. 2007 ("Large Language Models in
  * Machine Translation"): no discounting, no normalization, just count
  * ratios with a fixed backoff multiplier α = 0.4, chosen there
  * PRECISELY because it keeps the model embarrassingly distributable —
  * every score is a lookup chain over sharded count tables, never a
  * global normalization pass. q90's unigram scorer is the degenerate
  * case; this is the real production shape.
  *
  * Train/score split follows the catalog's holdout convention
  * (q91/q155/q157): the model trains on docs with doc_id % BatchMod ≠ 0
  * and scores the HELD-OUT batch, so unseen n-grams actually occur and
  * the backoff chain is exercised for real (at sf0.1 the held-out set
  * scores ~26k tokens: ~25.9k at the trigram level, ~38 backed off to
  * bigram; the unigram floor is reachable only via an unseen bigram —
  * covered by NgramLmSpec's hand corpus, including an unseen WORD
  * hitting the +1 floor).
  *
  * Per held-out token at position ≥ 2 (full trigram context):
  *
  *   S(w₃|w₁w₂) = c₃(w₁w₂w₃) / c₂(w₁w₂)            if the trigram was seen
  *              = 0.4 · c₂(w₂w₃) / c₁(w₂)          else if the bigram was
  *              = 0.16 · (c₁(w₃)+1) / (N+V)        else (add-1 unigram
  *                                                  floor, so an unseen
  *                                                  word scores finite)
  *
  * Scale: the three count tables are plain hash aggregates over the
  * training corpus (map-side combined; the trigram table is bounded by
  * distinct trigrams, heavy-tail-bounded like q149's vocab); scoring is
  * per-doc window lags (partitioned by doc_id — never a global window)
  * plus FIVE left joins against the count tables, all shuffle joins on
  * n-gram keys — Brants' architecture shards counts by n-gram hash and
  * routes lookups the same way, which is exactly what Spark's hash join
  * does; nothing is broadcast (a 100 TB corpus's n-gram tables are not
  * dim tables — the q67/q90 rule). N and V ride along as one broadcast
  * row. Numeric contract: every score is a ratio of integers times the
  * double literals 0.4 / 0.16 (identical doubles in both engines,
  * correctly-rounded ops), and the per-doc mean log2 is rounded at 3 dp
  * (the q90 rule), so the driver hash is plan- and engine-stable.
  *
  * On top of held-out evaluation (q162), the trained model drives the
  * two classic CORPUS uses of a web-scale LM:
  *  - q168: CCNet-style perplexity FILTERING (Wenzek et al. 2020) —
  *    score every document and keep the above-mean half, with the mean
  *    gate evaluated in exact integer arithmetic (milli-log2 scores) so
  *    the kept set is bit-stable under partitioning;
  *  - q169: crawl prioritization — roll per-page quality up the
  *    extracted link graph ([[LinkGraph]]) to rank HOSTS by the quality
  *    mass of the pages that link to them.
  */
object NgramLm extends QueryPack {

  /** Backoff multiplier (Brants et al. use 0.4, untuned). 0.16 = α²
    * is written as a LITERAL in both engines — 0.4*0.4 computed in
    * doubles is 0.16000000000000003, a different double than the
    * literal, and the two engines must agree bit-for-bit. */
  val Alpha = 0.4

  private def toks(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))

  private def withCtx(t: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    t.select(col("doc_id"), col("pos"),
      lag(col("w"), 2).over(byDoc).as("w1"),
      lag(col("w"), 1).over(byDoc).as("w2"),
      col("w").as("w3"))
  }

  /** Per-token backoff scores for `target` under count tables trained
    * on `train`: (doc_id, lvl ∈ {tri,bi,uni}, s). The shared core of
    * q162 (held-out eval), q168 (corpus filter), q169 (host rollup). */
  def scoredTokens(train: DataFrame, target: DataFrame): DataFrame = {
    val trw = toks(train)
    val trc = withCtx(trw)
    val uni = trw.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bi = trc.filter(col("w2").isNotNull)
      .groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("c2"))
    val tri = trc.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c3"))
    val nv = trw.agg(count(lit(1)).as("n"),
      count_distinct(col("w")).as("v"))
    val te = withCtx(toks(target)).filter(col("w1").isNotNull)
    te
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w2").as("w1"), col("w3").as("w2"),
        col("c2").as("cctx")), Seq("w1", "w2"), "left")
      .join(bi, Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c1w3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc_id"),
        when(col("c3").isNotNull, lit("tri"))
          .when(col("c2").isNotNull, lit("bi"))
          .otherwise(lit("uni")).as("lvl"),
        when(col("c3").isNotNull,
          col("c3").cast("double") / col("cctx"))
          .when(col("c2").isNotNull,
            lit(Alpha) * col("c2").cast("double") / col("c1w2"))
          .otherwise(lit(0.16) *
            (coalesce(col("c1w3"), lit(0L)) + lit(1L)).cast("double") /
            (col("n") + col("v"))).as("s"))
  }

  private def baseDocs(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(Graph.BatchMod.toLong)) =!= 0L)

  /** Score the held-out batch under the base-trained model: per doc,
    * token count, per-backoff-level counts, and the mean log2 score. */
  def stupidBackoffScore(spark: SparkSession, docs: DataFrame): DataFrame = {
    val test = docs.filter(pmod(col("doc_id"), lit(Graph.BatchMod.toLong)) === 0L)
    scoredTokens(baseDocs(docs), test)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("lvl") === "tri", 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === "bi", 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === "uni", 1L).otherwise(0L)).as("n_uni"),
        round(avg(log2(col("s"))), 3).as("avg_log2s"))
  }

  /** Per-doc LM quality over the WHOLE corpus under the base-trained
    * model, as an exact-integer milli-log2 score: round(avg,3) is the
    * engine-stable double of q162, ×1000 and round lands on (within
    * 1e-10 of) an integer, so the BIGINT s_milli is bit-stable in both
    * engines. Docs with < 3 tokens score no trigram context and drop
    * out — they carry no LM evidence either way. */
  def docScoresMilli(docs: DataFrame): DataFrame =
    scoredTokens(baseDocs(docs), docs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        round(avg(log2(col("s"))), 3).as("avg_log2s"))
      .select(col("doc_id"), col("n_scored"),
        round(col("avg_log2s") * lit(1000), 0).cast("long").as("s_milli"))

  /** CCNet-style perplexity gate (Wenzek et al. 2020 run corpora
    * through a KenLM and keep the low-perplexity slice): keep documents
    * whose mean log2 score is at or above the CORPUS mean. The gate is
    * evaluated in exact integer arithmetic — s_milli·n_docs ≥ Σs_milli —
    * so membership never hinges on a float sum's add order: one scalar
    * aggregate broadcast against the scored set, no second shuffle. At
    * 100 TB the scored set streams map-only past the broadcast row;
    * the LM lookup joins upstream are the only shuffles. */
  def lmQualityGate(docs: DataFrame): DataFrame = {
    val scored = docScoresMilli(docs)
    val tot = scored.agg(sum(col("s_milli")).as("tot"),
      count(lit(1)).as("nd"))
    scored.crossJoin(broadcast(tot))
      .filter(col("s_milli") * col("nd") >= col("tot"))
      .select(col("doc_id"), col("n_scored"), col("s_milli"))
  }

  /** Crawl prioritization: the quality mass flowing INTO each host from
    * the pages that link to it — join the extracted link occurrences
    * ([[LinkGraph.extractLinks]]) to the per-page milli-log2 scores and
    * aggregate per target host. A frontier scheduler fetches
    * high-s_sum hosts first (links from high-quality pages are the
    * classic seed-quality signal). Inner join: only LM-scored pages
    * vote (a 1–2-token page carries no evidence). One shuffle each for
    * the score join (doc_id) and the host rollup (dst_host); the
    * distinct-doc count is exact per host. */
  def hostQualityRollup(docs: DataFrame): DataFrame =
    LinkGraph.extractLinks(LinkGraph.pages(docs))
      .join(docScoresMilli(docs).select(col("doc_id").as("src_doc"),
        col("s_milli")), "src_doc")
      .groupBy(col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("src_doc")).as("n_docs"),
        sum(col("s_milli")).as("s_sum"))

  /** Shared oracle CTE chain: count tables over `trainPred` docs,
    * per-token backoff scores for `targetPred` docs, ending in
    * `sc(doc_id, lvl, s)` — the SQL twin of [[scoredTokens]]. */
  private def backoffCtes(trainPred: String, targetPred: String): String = s"""
        base AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        trtok AS (
          SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws
          FROM base WHERE $trainPred
        ),
        trw AS (SELECT doc_id, i, ws[i] AS w FROM trtok),
        trc AS (
          SELECT doc_id, i,
                 lag(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w1,
                 lag(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
                 w AS w3
          FROM trw
        ),
        uni AS (SELECT w, count(*) AS c1 FROM trw GROUP BY 1),
        bi AS (SELECT w2, w3, count(*) AS c2 FROM trc
               WHERE w2 IS NOT NULL GROUP BY 1, 2),
        tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM trc
                WHERE w1 IS NOT NULL GROUP BY 1, 2, 3),
        nv AS (SELECT (SELECT count(*) FROM trw) AS n,
                      (SELECT count(DISTINCT w) FROM trw) AS v),
        tetok AS (
          SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws
          FROM base WHERE $targetPred
        ),
        tew AS (SELECT doc_id, i, ws[i] AS w FROM tetok),
        tec AS (
          SELECT doc_id, i,
                 lag(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w1,
                 lag(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
                 w AS w3
          FROM tew
        ),
        sc AS (
          SELECT t.doc_id,
                 CASE WHEN tri.c3 IS NOT NULL THEN 'tri'
                      WHEN bi2.c2 IS NOT NULL THEN 'bi'
                      ELSE 'uni' END AS lvl,
                 CASE WHEN tri.c3 IS NOT NULL
                        THEN CAST(tri.c3 AS DOUBLE) / ctx.c2
                      WHEN bi2.c2 IS NOT NULL
                        THEN $Alpha * CAST(bi2.c2 AS DOUBLE) / u2.c1
                      ELSE 0.16 * (COALESCE(u3.c1, 0) + 1)
                           / CAST(nv.n + nv.v AS DOUBLE) END AS s
          FROM (SELECT * FROM tec WHERE w1 IS NOT NULL) t
          LEFT JOIN tri ON tri.w1 = t.w1 AND tri.w2 = t.w2 AND tri.w3 = t.w3
          LEFT JOIN bi ctx ON ctx.w2 = t.w1 AND ctx.w3 = t.w2
          LEFT JOIN bi bi2 ON bi2.w2 = t.w2 AND bi2.w3 = t.w3
          LEFT JOIN uni u2 ON u2.w = t.w2
          LEFT JOIN uni u3 ON u3.w = t.w3
          CROSS JOIN nv
        )"""

  private val trainPred = s"doc_id % ${Graph.BatchMod} <> 0"

  /** Oracle CTE for the per-doc milli-log2 score of the whole corpus:
    * appends the q168/q169 quantization to the shared chain. Package-
    * private: q179's frontier oracle (Crawl) reuses it for the priority
    * feed, so the feed's oracle cannot drift from q169's. */
  private[operators] def scoredMilliCtes: String =
    s"""${backoffCtes(trainPred, "TRUE")},
        scored AS (
          SELECT doc_id, count(*) AS n_scored,
                 CAST(round(round(avg(log2(s)), 3) * 1000, 0) AS BIGINT)
                   AS s_milli
          FROM sc GROUP BY 1
        )"""

  def queries: Map[String, Q] = Map(
    // Held-out scoring under the base-trained model with the real
    // backoff chain live (tri + bi levels both fire on this corpus).
    // Per-level integer counts oracle the CONTROL FLOW of the backoff,
    // not just the blended float.
    "q162_stupid_backoff" -> Q(
      (s, d) => stupidBackoffScore(s, T.documents(s, d)),
      Some(s"""
        WITH ${backoffCtes(trainPred, s"doc_id % ${Graph.BatchMod} = 0")}
        SELECT doc_id, count(*) AS n_scored,
               CAST(sum(CASE WHEN lvl = 'tri' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_tri,
               CAST(sum(CASE WHEN lvl = 'bi' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bi,
               CAST(sum(CASE WHEN lvl = 'uni' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_uni,
               round(avg(log2(s)), 3) AS avg_log2s
        FROM sc GROUP BY 1
      """.stripMargin),
      doc = "Stupid-backoff trigram LM (Brants et al.): count tables " +
        "trained on the base docs, held-out batch scored through the " +
        "live tri→bi→add-1-unigram backoff chain; per-level counts + " +
        "3dp mean log2 oracled"),

    // CCNet-style corpus filter: every doc scored under the base-trained
    // LM, kept iff its milli-log2 score is at/above the corpus mean —
    // the mean gate in exact integer arithmetic (s_milli·n_docs ≥ Σ),
    // so the kept SET is bit-stable and hash-oracled.
    "q168_lm_quality_gate" -> Q(
      (s, d) => lmQualityGate(T.documents(s, d)),
      Some(s"""
        WITH $scoredMilliCtes,
        tot AS (SELECT CAST(sum(s_milli) AS BIGINT) AS tot,
                       CAST(count(*) AS BIGINT) AS nd FROM scored)
        SELECT doc_id, n_scored, s_milli
        FROM scored CROSS JOIN tot
        WHERE s_milli * nd >= tot
      """.stripMargin),
      doc = "LM perplexity gate (CCNet): whole corpus scored under the " +
        "base-trained trigram LM, above-integer-mean docs kept; the " +
        "gate is exact milli-log2 arithmetic so membership is " +
        "partition-stable and hash-oracled"),

    // Crawl prioritization: per-page LM quality rolled up the extracted
    // link graph — per target host, link count, distinct scored linking
    // docs, and the integer quality mass.
    "q169_host_quality_rollup" -> Q(
      (s, d) => hostQualityRollup(T.documents(s, d)),
      Some(s"""
        WITH $scoredMilliCtes,${LinkGraph.linksSql}
        SELECT l.dst_host, count(*) AS n_links,
               count(DISTINCT l.src_doc) AS n_docs,
               CAST(sum(s.s_milli) AS BIGINT) AS s_sum
        FROM links l JOIN scored s ON s.doc_id = l.src_doc
        GROUP BY 1
      """.stripMargin),
      doc = "Host quality rollup: LM milli-log2 page scores joined onto " +
        "the extracted link occurrences and aggregated per target host " +
        "— the frontier-scheduler seed-quality signal; counts + integer " +
        "quality mass oracled")
  )
}
