package graft.operators

import graft.functions.TextOps
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge-table TRAINING — the step
  * q117's vocabulary encode consumes but nothing in the catalog learned.
  * Reference scope: the training-data-pipeline surface of the builder
  * brief ("token counting … a BPE-ish regex"); the trainer is the
  * beyond-parity completion of that family (learn the merges, don't just
  * apply a fixed list).
  *
  * The 100 TB shape is the classic Sennrich formulation: BPE statistics
  * are a function of the DISTINCT-WORD table weighted by corpus counts,
  * not of the corpus itself. The only corpus-sized pass is the initial
  * word count (one map-side-combined aggregate); every training round
  * then runs over the vocabulary — bounded by distinct words, which is
  * heavy-tail-bounded (≪ corpus size) at any scale. Per round:
  *
  *  - pair statistics: one aggregate over (sym, next-sym) weighted by
  *    word count — map-side combined, output bounded by |symbol pairs|;
  *  - argmax: a global TakeOrderedAndProject to ONE row (count DESC,
  *    then lexicographic — fully deterministic under ties). The per-round
  *    collect is 1 row BY CONSTRUCTION, like q117's capped vocab.
  *  - merge application: window passes all partitioned by `w` (never a
  *    global window — one exchange, reused across the chained windows),
  *    implementing GREEDY LEFT-TO-RIGHT non-overlapping replacement via
  *    run-parity: inside each maximal run of consecutive matching
  *    positions, exactly the even offsets merge ("aaaa" + (a,a) → "aa",
  *    "aa", not three overlapping pairs).
  *
  * Round state is materialized through [[Rounds]] (localCheckpoint on
  * local[*]; a reliable checkpoint dir on a cluster) so the composed plan
  * stays flat across rounds instead of growing until Catalyst analysis
  * dominates — same discipline as the connected-components contraction.
  */
object Bpe extends QueryPack {

  /** Training rounds for the catalog entry (a parameter in production). */
  val TrainRounds = 10

  private def byW = Window.partitionBy("w").orderBy("pos")

  /** One word per row with its corpus count — the vocab-sized working
    * set every training round runs over. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))

  /** (w, wcnt, pos, sym): each distinct word split into 1-char symbols.
    * substr-based (not regex-split) so the oracle's substr(w, i, 1)
    * replays it exactly. */
  def charSymbols(words: DataFrame): DataFrame =
    words.select(col("w"), col("wcnt"),
      posexplode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as(Seq("pos", "sym")))

  /** Apply ONE learned merge (lhs, rhs) to a symbol table with greedy
    * left-to-right non-overlap semantics. Exposed for the spec's
    * run-parity property tests. */
  def applyMerge(syms: DataFrame, lhs: String, rhs: String): DataFrame = {
    val m = syms.select(col("w"), col("wcnt"), col("pos"), col("sym"),
      coalesce(col("sym") === lhs &&
        lead(col("sym"), 1).over(byW) === rhs, lit(false)).as("m"))
    // gaps-and-islands: pos - running-match-count is constant within a
    // run of consecutive matches and strictly increases across runs
    val isl = m.withColumn("island",
      when(col("m"), col("pos") - sum(when(col("m"), 1L).otherwise(0L))
        .over(byW.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    // greedy = even offset from the run head
    val sel = isl.withColumn("sel",
      col("m") && (col("pos") -
        min(col("pos")).over(Window.partitionBy(col("w"), col("island"))))
        % 2 === 0)
    sel
      .withColumn("absorbed", coalesce(lag(col("sel"), 1).over(byW), lit(false)))
      .where(!col("absorbed"))
      .select(col("w"), col("wcnt"),
        (row_number().over(byW) - 1).as("pos"),
        when(col("sel"), lit(lhs + rhs)).otherwise(col("sym")).as("sym"))
  }

  /** Learned merges as driver values — (rnd, lhs, rhs, cnt) per round,
    * most-frequent adjacent symbol pair first, ties broken (lhs, rhs)
    * lexicographically. Stops early if the vocabulary runs out of
    * pairs. The merge table IS driver-sized by construction (one row
    * per round), so exposing it as a Seq is not a collect smell — it's
    * the tokenizer artifact every encoder ships with. */
  def trainMergesSeq(docs: DataFrame, rounds: Int,
                     checkpointDir: Option[String] = None)
      : Seq[(Int, String, String, Long)] = {
    val rc = Rounds(checkpointDir)
    rc.init(docs)
    var syms = rc.mark(charSymbols(wordCounts(docs)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // 1-row collect by construction (the argmax of the pair stats)
      val best = syms
        .select(col("sym"), lead(col("sym"), 1).over(byW).as("nxt"), col("wcnt"))
        .where(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (lhs, rhs, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, lhs, rhs, cnt))
        syms = rc.mark(applyMerge(syms, lhs, rhs))
        r += 1
      }
    }
    merges.toSeq
  }

  /** Learned merge table as a DataFrame: (rnd, lhs, rhs, merged, cnt). */
  def trainMerges(docs: DataFrame, rounds: Int,
                  checkpointDir: Option[String] = None): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    trainMergesSeq(docs, rounds, checkpointDir)
      .toDF("rnd", "lhs", "rhs", "cnt")
      .select(col("rnd"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
  }

  /** Tokenize with a TRAINED model — the q117-shaped consumer of
    * [[trainMergesSeq]]'s artifact, completing the tokenizer family
    * (learn the merges, then encode unseen text with them). Trains on
    * the base docs (doc_id % BatchMod ≠ 0), then applies the merges IN
    * LEARNED ORDER to the DISTINCT words of the held-out batch — the
    * production shape: a corpus is tokenized by encoding its
    * vocabulary once and joining the word→pieces map back, never by
    * re-running merges per occurrence. Output (w, bpe): each held-out
    * word's piece sequence, space-joined. Per merge: the same
    * run-parity window passes as training, all partitioned by `w`,
    * state checkpointed per round so the plan stays flat. */
  def encodeHeldOut(docs: DataFrame, rounds: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    val base = docs.filter(pmod(col("doc_id"), lit(Graph.BatchMod.toLong)) =!= 0L)
    val test = docs.filter(pmod(col("doc_id"), lit(Graph.BatchMod.toLong)) === 0L)
    val merges = trainMergesSeq(base, rounds, checkpointDir)
    val testWords = test
      .select(explode(TextOps.words(col("text"))).as("w"))
      .distinct()
      .select(col("w"), lit(1L).as("wcnt"))
    val rc = Rounds(checkpointDir)
    var syms = rc.mark(charSymbols(testWords))
    merges.foreach { case (_, lhs, rhs, _) =>
      syms = rc.mark(applyMerge(syms, lhs, rhs))
    }
    syms.groupBy(col("w"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("sym")))),
          x => x.getField("sym")), " ").as("bpe"))
  }

  /** One run-parity merge application as CTE text: apply `best` to
    * `from`, emitting `to`; intermediate CTEs are suffixed `tag`.
    * Shared by the training replay (q149) and the encode replay (q165)
    * so the two oracles cannot drift from each other. */
  private def applySql(from: String, to: String, best: String,
                       tag: String): String = s""",
      mm_$tag AS (
        SELECT s.w, s.wcnt, s.pos, s.sym, b.lhs, b.rhs,
               COALESCE(s.sym = b.lhs AND
                 lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos) = b.rhs,
                 FALSE) AS m
        FROM $from s CROSS JOIN $best b
      ),
      ii_$tag AS (
        SELECT *, CASE WHEN m THEN pos - sum(CASE WHEN m THEN 1 ELSE 0 END)
          OVER (PARTITION BY w ORDER BY pos ROWS UNBOUNDED PRECEDING) END
          AS island
        FROM mm_$tag
      ),
      ss_$tag AS (
        SELECT *, m AND (pos - min(pos) OVER (PARTITION BY w, island)) % 2 = 0
          AS sel
        FROM ii_$tag
      ),
      $to AS (
        SELECT w, wcnt, row_number() OVER (PARTITION BY w ORDER BY pos) - 1
                 AS pos,
               CASE WHEN sel THEN lhs || rhs ELSE sym END AS sym
        FROM (SELECT *, COALESCE(lag(sel) OVER (PARTITION BY w ORDER BY pos),
                                 FALSE) AS absorbed
              FROM ss_$tag)
        WHERE NOT absorbed
      )"""

  /** Training CTE chain over `documents` rows matching `where`: wrd,
    * syms_0, then per round r: pair_r, best_r, syms_r. */
  private def trainSql(rounds: Int, where: String): String = {
    val base = s"""
      WITH wrd AS (
        SELECT w, count(*) AS wcnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents $where)
        GROUP BY w
      ),
      syms_0 AS (
        SELECT w, wcnt, i - 1 AS pos, substr(w, CAST(i AS INT), 1) AS sym
        FROM (SELECT w, wcnt, unnest(range(1, len(w) + 1)) AS i FROM wrd)
      )"""
    val roundCtes = (1 to rounds).map { r =>
      val p = r - 1
      s""",
      pair_$r AS (
        SELECT sym AS lhs, nxt AS rhs, CAST(sum(wcnt) AS BIGINT) AS cnt
        FROM (SELECT sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
                     wcnt
              FROM syms_$p)
        WHERE nxt IS NOT NULL GROUP BY 1, 2
      ),
      best_$r AS (
        SELECT lhs, rhs, cnt FROM pair_$r
        ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
      )${applySql(s"syms_$p", s"syms_$r", s"best_$r", s"$r")}"""
    }.mkString
    base + roundCtes
  }

  /** DuckDB replay of `rounds` training rounds — generated, not
    * hand-written: each round chains the same pair-count / argmax /
    * run-parity-apply CTEs the Spark plan executes. */
  def oracle(rounds: Int): String = {
    val unioned = (1 to rounds).map { r =>
      s"SELECT CAST($r AS INT) AS rnd, lhs, rhs, lhs || rhs AS merged, cnt FROM best_$r"
    }.mkString("\n      UNION ALL\n      ")
    s"${trainSql(rounds, "")}\n      $unioned"
  }

  /** DuckDB replay of train-on-base + encode-held-out (q165): the
    * training chain filtered to base docs, then the SAME apply CTEs
    * chained over the held-out vocabulary's character symbols. */
  def oracleEncode(rounds: Int): String = {
    val base = trainSql(rounds, s"WHERE doc_id % ${Graph.BatchMod} <> 0")
    val testCtes = s""",
      twrd AS (
        SELECT DISTINCT w, CAST(1 AS BIGINT) AS wcnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id % ${Graph.BatchMod} = 0)
      ),
      tsyms_0 AS (
        SELECT w, wcnt, i - 1 AS pos, substr(w, CAST(i AS INT), 1) AS sym
        FROM (SELECT w, wcnt, unnest(range(1, len(w) + 1)) AS i FROM twrd)
      )"""
    val applyCtes = (1 to rounds).map { r =>
      applySql(s"tsyms_${r - 1}", s"tsyms_$r", s"best_$r", s"t$r")
    }.mkString
    s"""$base$testCtes$applyCtes
      SELECT w, string_agg(sym, ' ' ORDER BY pos) AS bpe
      FROM tsyms_$rounds GROUP BY w"""
  }

  def queries: Map[String, Q] = Map(
    "q149_bpe_train" -> Q(
      (s, d) => trainMerges(T.documents(s, d), TrainRounds),
      Some(oracle(TrainRounds)),
      doc = "distributed BPE merge training: vocab-sized working set, " +
        "1-row argmax per round, greedy run-parity merge application"),

    // Train on the base docs, encode the held-out vocabulary with the
    // learned merges in order — the full tokenizer pipeline (q149's
    // artifact consumed the way production consumes it: tokenize the
    // distinct-word table once, join the word→pieces map back).
    "q165_bpe_encode" -> Q(
      (s, d) => encodeHeldOut(T.documents(s, d), TrainRounds),
      Some(oracleEncode(TrainRounds)),
      doc = "BPE encode with the TRAINED merge table: base-doc training " +
        "+ in-order run-parity application to the held-out vocabulary; " +
        "word piece sequences oracled bit-for-bit")
  )
}
