package graft.operators

import graft.functions.{NGramHash64, TextOps}
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators over the `documents` table — the
  * steps between "raw crawl" and "training mix" that the dedup/quality
  * packs don't cover: PII redaction, stratified quota sampling for mix
  * construction, benchmark decontamination, and sequence packing into
  * fixed-size context windows.
  *
  * Scale shapes (SCALE.md has the full arguments):
  *   - q83/q84 are pure scan projections (q84 adds one tiny per-stratum
  *     aggregate broadcast back) — embarrassingly parallel at 100 TB.
  *   - q85 joins corpus n-grams against a BROADCAST benchmark gram set;
  *     benchmarks are small by nature (that's why decontamination is
  *     feasible at all), so the corpus side never shuffles.
  *   - q86 packs per deterministic shard; shard count scales with the
  *     cluster, each shard's window is a sorted streaming aggregate.
  */
object Curation extends QueryPack {

  /** Knuth multiplicative hash — identical integer arithmetic on both
    * engines (DuckDB has no xxhash64; at 100 TB you'd swap in
    * `xxhash64(doc_id)`, the sampling logic is hash-agnostic). */
  private val Knuth = 2654435761L

  /** doc_id is folded to 31 bits BEFORE the Knuth multiply: the raw
    * product wraps silently in Spark (and errors under ANSI mode) for
    * doc_id ≳ 3.5e9 while DuckDB raises an overflow — folding first keeps
    * the arithmetic identical on both engines at any NON-NEGATIVE id
    * ((2³¹−1)·K ≈ 5.7e18 stays inside int64; negative ids are outside the
    * contract — Spark's pmod and DuckDB's sign-following % disagree
    * there). At test scale ids are < 2³¹ so the fold is the identity and
    * oracles are unchanged numerically. */
  private val IdFold = 2147483648L // 2^31
  private def mixed(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(c, lit(IdFold)) * Knuth
  private val MixSql = s"((doc_id % $IdFold) * $Knuth)"

  /** Second mixing prime (xxhash32's PRIME2) for the within-shard file
    * salt — independent of the shard hash so sub-files split evenly. */
  private val Salt2 = 2246822519L

  /** q86's pack-id namespace: the shard id occupies the bits above 2⁴⁰,
    * so per-shard pack numbers stay collision-free until a single shard
    * exceeds 2⁴⁰ × 512 ≈ 5.6e14 tokens. */
  val PackBits = 40

  /** Shard fan-out of the written training mix (q94). Production sizes
    * this to the writer cluster; the assignment rule is shard-count- and
    * row-order-independent either way. */
  val NShards = 8

  /** Materialize the corpus as deterministic hash shards: one parquet
    * directory per shard, each row landing in the shard q94's manifest
    * accounts for. The exchange is keyed on (shard, salt) so a shard's
    * rows arrive at exactly `filesPerShard` writer tasks (no partitionBy
    * row-scatter: every task would otherwise open a file in EVERY shard
    * dir — the small-files explosion at 100 TB), and `partitionBy` turns
    * the shard id into the directory layout consumers list.
    *
    * At TB-sized shards one writer task per shard is the bottleneck:
    * `filesPerShard` sub-splits each shard across k parallel writers on a
    * second independent doc_id hash (deterministic — reruns produce the
    * same file membership), and `maxRecordsPerFile` (0 = unlimited) caps
    * any single file regardless. Routing is EXACT one-combo-per-task:
    * plain `repartition(m, shard, salt)` hashes the pair and lets combos
    * collide into one task (measured at 8×3: a shard lost a file while a
    * sibling writer sat idle), and `repartitionByRange` merges
    * small-sample combos the same way — so each (shard, salt) combo is
    * instead routed through a driver-chosen value whose
    * `pmod(hash(v), m)` partition ids are pairwise distinct
    * ([[routeValues]]). */
  def writeSharded(docs: org.apache.spark.sql.DataFrame, dir: String,
                   filesPerShard: Int = 1, maxRecordsPerFile: Long = 0L): Unit = {
    require(filesPerShard >= 1, s"filesPerShard must be >= 1, got $filesPerShard")
    val m = NShards * filesPerShard
    val routes = routeValues(docs.sparkSession, m)
    docs
      .withColumn("shard", pmod(mixed(col("doc_id")), lit(NShards)).cast("int"))
      // combo index: shard-major, sub-file minor (independent second hash)
      .withColumn("__grp", (col("shard") * filesPerShard +
        pmod(pmod(col("doc_id"), lit(IdFold)) * Salt2, lit(filesPerShard.toLong)))
        .cast("int"))
      .withColumn("__route", element_at(typedLit(routes), col("__grp")))
      .repartition(m, col("__route"))
      .drop("__grp", "__route")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard").parquet(dir)
  }

  /** One route value per combo index 0..m−1 such that Spark's
    * hash-partition placement `pmod(hash(v), m)` is pairwise distinct —
    * `functions.hash` IS the Murmur3(seed 42) that `hashPartitioning`
    * uses, so verifying distinctness here guarantees distinct writer
    * tasks at execution. Deterministic (fixed hash, ascending scan);
    * coupon-collector needs ~m·ln m candidates, 64·m gives huge margin
    * and the require guards the tail risk. */
  private def routeValues(spark: org.apache.spark.sql.SparkSession,
                          m: Int): Map[Int, Long] = {
    import spark.implicits._
    val cand = spark.range(0, 64L * m)
      .select($"id", pmod(hash($"id"), lit(m)).cast("int").as("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byPart = scala.collection.mutable.LinkedHashMap[Int, Long]()
    cand.foreach { case (v, p) => if (!byPart.contains(p)) byPart(p) = v }
    require(byPart.size == m, s"route search covered ${byPart.size}/$m partitions")
    byPart.values.toSeq.sorted.zipWithIndex.map { case (v, g) => g -> v }.toMap
  }

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Serialized Bloom filter over a Long column — the build side of the
    * Bloom-prefiltered decontamination path (q96). Uses Spark's own
    * sketch aggregate (`BloomFilterAggregate`, the expression behind
    * AQE's runtime row-level filtering) so probes stay inside codegen;
    * bit count follows the standard optimal sizing for the target
    * false-positive rate. The returned bytes are a plan-shippable
    * constant: production builds this ONCE from the benchmark suite,
    * persists it beside the eval set, and reuses it for every ingest
    * batch — the eval scan drops out of the steady-state path. */
  def longBloom(rel: org.apache.spark.sql.DataFrame, colName: String,
                expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(expectedItems > 0, s"expectedItems=$expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY clamps both sizes to the runtime-
    // filter conf caps (Math.min in the 4.1.2 aggregate) — past them the
    // real fpp degrades without any signal, exactly in the large-eval
    // regime this path exists for. Fail loudly instead: the caller raises
    // the caps knowingly or accepts a documented fpp.
    val conf = rel.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom needs $expectedItems items / $numBits bits but the session caps " +
        s"are $maxItems / $maxBits — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
        "or accept a larger fpp")
    val agg = new BloomFilterAggregate(
      org.apache.spark.sql.graft.Bridge.expression(col(colName)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    rel.select(org.apache.spark.sql.graft.Bridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd Bloom probe of a serialized filter: false positives at the
    * build fpp, false negatives never — so prune-then-exact-confirm
    * pipelines are exact. */
  def mightContain(bloom: Array[Byte], value: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloom, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graft.Bridge.expression(value)))

  /** Word n-gram hashes of a document relation, distinct PER DOC (one
    * row per (doc_id, gram) — a gram repeated inside one doc appears
    * once; the same gram in k docs appears k times). The unit both
    * decontamination paths (q85/q96) operate on. */
  def docGrams(docs: org.apache.spark.sql.DataFrame, n: Int = 3)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      explode(NGramHash64.ngramHashes(TextOps.words(col("text")), n)).as("g"))

  /** The CORPUS-distinct gram set of an eval corpus — the build input for
    * `longBloom` and the confirm side of `decontaminate` (docGrams alone
    * is only per-doc distinct; joining it directly would multiply counts
    * by a gram's eval-doc frequency). */
  def evalGramSet(evalDocs: org.apache.spark.sql.DataFrame, n: Int = 3)
      : org.apache.spark.sql.DataFrame =
    docGrams(evalDocs, n).select(col("g")).distinct()

  /** Bloom-prefiltered benchmark decontamination: per training doc, how
    * many of its distinct word n-grams appear anywhere in the eval set.
    * `evalGrams` MUST be distinct on `g` (use [[evalGramSet]]) — a
    * duplicated eval gram would multiply every match it joins. `bloom` is
    * the serialized eval-gram filter — build it ONCE per benchmark
    * release with `longBloom(evalGrams, "g", nGrams)` and reuse it for
    * every ingest batch; the probe prunes the corpus gram stream in the
    * scan stage and the exact confirm join against `evalGrams` drops the
    * false positives, so the output is row-identical to the direct join
    * (q85) with the join fed ~the contaminated fraction + fpp of the
    * corpus instead of all of it. */
  def decontaminate(trainGrams: org.apache.spark.sql.DataFrame,
                    evalGrams: org.apache.spark.sql.DataFrame,
                    bloom: Array[Byte]): org.apache.spark.sql.DataFrame =
    trainGrams
      .filter(mightContain(bloom, col("g")))
      .join(evalGrams.select(col("g")), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))

  def queries: Map[String, Q] = Map(

    // ---- PII redaction ----
    // The fixture corpus carries no natural PII, so both engines first
    // graft deterministic synthetic contacts onto the text (varying per
    // doc so the counts aren't constant), then redact. The operator under
    // test is the redaction pass: regex scrub + per-class counts, one
    // codegen'd projection over the scan — no shuffle at any scale.
    "q83_pii_scrub" -> Q(
      (s, d) => {
        import s.implicits._
        val pii = concat(
          $"text",
          when($"doc_id" % 3 > 0,
            concat(lit(" reach user"), $"doc_id".cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when($"doc_id" % 4 > 0,
            concat(lit(" call 555-"),
              lpad(pmod($"doc_id" * 7, lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")))
        T.documents(s, d)
          .withColumn("pii_text", pii)
          .select(
            $"doc_id",
            regexp_replace(
              regexp_replace($"pii_text", lit(EmailRe), lit("<EMAIL>")),
              lit(PhoneRe), lit("<PHONE>")).as("clean_text"),
            regexp_count($"pii_text", lit(EmailRe)).cast("int").as("n_emails"),
            regexp_count($"pii_text", lit(PhoneRe)).cast("int").as("n_phones"))
      },
      Some(s"""
        WITH pii AS (
          SELECT doc_id,
                 text ||
                 CASE WHEN doc_id % 3 > 0
                      THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                      ELSE '' END ||
                 CASE WHEN doc_id % 4 > 0
                      THEN ' call 555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END AS pii_text
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(pii_text,
                 '$EmailRe', '<EMAIL>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g') AS clean_text,
               CAST(len(regexp_extract_all(pii_text, '$EmailRe')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(pii_text, '$PhoneRe')) AS INT) AS n_phones
        FROM pii
      """.stripMargin),
      doc = "PII redaction: email/phone regex scrub + per-class counts"),

    // ---- stratified quota sampling (training-mix construction) ----
    // Target ≤50 docs per language stratum. Per-stratum rate =
    // min(1, target/|stratum|); keep a doc iff its hash bucket falls
    // under the rate — deterministic, single-pass, no sort, no window.
    // The stratum-count aggregate is |languages|-sized → broadcast back;
    // the keep/drop decision is a pure projection over the scan.
    "q84_quota_sample" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = T.documents(s, d)
        val cnts = docs.groupBy($"lang").agg(count(lit(1)).as("n_lang"))
        docs.join(broadcast(cnts), "lang")
          .withColumn("bucket", pmod(mixed($"doc_id"), lit(1000000L)))
          .filter($"bucket" <
            floor(least(lit(1.0), lit(50.0) / $"n_lang") * 1000000).cast("long"))
          .select($"doc_id", $"lang", $"bucket")
      },
      Some(s"""
        WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang)
        SELECT doc_id, lang, $MixSql % 1000000 AS bucket
        FROM documents JOIN c USING (lang)
        WHERE $MixSql % 1000000 <
              CAST(floor(least(CAST(1 AS DOUBLE),
                CAST(50 AS DOUBLE) / n_lang) * 1000000) AS BIGINT)
      """.stripMargin),
      doc = "deterministic stratified quota sampling by language"),

    // ---- deterministic train/val/test split ----
    // 98/1/1 by hash bucket of doc_id — the split every training run
    // needs: stable under reruns and corpus growth (a doc's split never
    // depends on other docs), no sort, no shuffle beyond the final audit
    // aggregate. Assignment itself is a pure projection — at 100 TB the
    // split is a filter each consumer pushes into its scan, not a
    // materialized table. The Knuth mixer stands in for xxhash64 (not
    // ANSI-SQL-expressible) so the oracle can replay the arithmetic; the
    // production swap is one line.
    "q91_train_split" -> Q(
      (s, d) => {
        import s.implicits._
        val bucket = pmod(mixed($"doc_id"), lit(100L))
        T.documents(s, d)
          .withColumn("split",
            when(bucket < 98, "train").when(bucket === 98, "val")
              .otherwise("test"))
          .groupBy($"split", $"lang")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      },
      Some(s"""
        SELECT CASE WHEN $MixSql % 100 < 98 THEN 'train'
                    WHEN $MixSql % 100 = 98 THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY 1, 2
      """.stripMargin),
      doc = "deterministic 98/1/1 train/val/test split with per-split audit counts"),

    // ---- cross-split leakage audit ----
    // The check every eval split needs AFTER splitting: near-duplicate
    // pairs whose endpoints landed in DIFFERENT splits (a test doc
    // near-duplicating a train doc silently inflates eval scores even
    // when exact-match decontamination passes). Composes the q91 split
    // rule with the q55 exact-Jaccard pair engine (PPJoin-pruned,
    // blocked by (lang, source) — leakage across blocks is invisible to
    // this detector by the same blocking contract q55 declares; run the
    // LSH tier for unblocked audits). Output is the leaking pair list —
    // the actionable artifact (re-assign or drop) — not just a count.
    // Scale: pair generation is the bounded q55 engine; the split join
    // is a pure projection on each side (no extra table).
    "q125_split_leakage" -> Q(
      (s, d) => {
        import s.implicits._
        val bucket = pmod(mixed($"doc_id"), lit(100L))
        val splits = T.documents(s, d).select($"doc_id",
          when(bucket < 98, "train").when(bucket === 98, "val")
            .otherwise("test").as("split"))
        Dedup.jaccardPairs(T.documents(s, d), threshold = 0.8)
          .join(splits.toDF("a_id", "a_split"), "a_id")
          .join(splits.toDF("b_id", "b_split"), "b_id")
          .filter($"a_split" =!= $"b_split")
          .select($"a_id", $"b_id", $"a_split", $"b_split", $"jaccard_r")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, lang, source,
                 list_distinct(string_split(text, ' ')) AS wset
          FROM documents
        ), exploded AS (
          SELECT doc_id, lang, source, len(wset) AS wsize,
                 unnest(wset) AS word
          FROM base
        ), pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 round(CAST(count(*) AS DOUBLE)
                   / (any_value(a.wsize) + any_value(b.wsize) - count(*)), 6) AS jaccard_r
          FROM exploded a
          JOIN exploded b
            ON a.lang = b.lang AND a.source = b.source AND a.word = b.word
           AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
          HAVING CAST(count(*) AS DOUBLE)
                   / (any_value(a.wsize) + any_value(b.wsize) - count(*)) >= 0.8
        ), sp AS (
          SELECT doc_id,
                 CASE WHEN $MixSql % 100 < 98 THEN 'train'
                      WHEN $MixSql % 100 = 98 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        )
        SELECT p.a_id, p.b_id, sa.split AS a_split, sb.split AS b_split,
               p.jaccard_r
        FROM pairs p
        JOIN sp sa ON sa.doc_id = p.a_id
        JOIN sp sb ON sb.doc_id = p.b_id
        WHERE sa.split <> sb.split
      """.stripMargin),
      doc = "cross-split near-dup leakage audit: q91 split x q55 pairs, endpoints in different splits"),

    // ---- temperature-scaled source mixing ----
    // The training-mix construction step after quotas: sample each source
    // proportionally to n^α (α < 1 up-weights small sources relative to
    // their raw share — the standard multilingual/multi-source rebalance).
    // α = 1/2 with the keep-rate anchored at the SMALLEST source kept
    // whole: r_i = sqrt(n_min/n_i), so kept_i = n_i·r_i ∝ sqrt(n_i) —
    // exact α=0.5 shares. This formulation uses only correctly-rounded
    // IEEE ops (one divide, one sqrt), so the rate — and therefore the
    // kept SET — is bit-identical cross-engine; the textbook share form
    // n^α/Σn^α needs pow and an order-dependent float sum, either of
    // which can flip a bucket boundary by 1 ulp (production α=0.7 uses
    // the same plumbing; it just has no second engine to agree with).
    // Scale: per-source counts are a |sources|-sized aggregate broadcast
    // back; the keep decision is a pure projection over the scan.
    "q93_temperature_mix" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = T.documents(s, d)
        val cnts = docs.groupBy($"source").agg(count(lit(1)).as("n_src"))
        val nMin = cnts.agg(min($"n_src").as("n_min"))
        val rated = cnts.crossJoin(broadcast(nMin))
          .withColumn("rate",
            sqrt($"n_min".cast("double") / $"n_src"))
        docs.join(broadcast(rated.select($"source", $"rate")), "source")
          .filter(pmod(mixed($"doc_id"), lit(1000000L)) <
            floor($"rate" * 1000000).cast("long"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("kept_chars"))
      },
      Some(s"""
        WITH c AS (
          SELECT source, count(*) AS n_src FROM documents GROUP BY source
        ), t AS (SELECT min(n_src) AS n_min FROM c),
        r AS (
          SELECT source, sqrt(CAST(n_min AS DOUBLE) / n_src) AS rate
          FROM c, t
        )
        SELECT d.source, count(*) AS n_kept,
               CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
        FROM documents d JOIN r ON d.source = r.source
        WHERE ((d.doc_id % $IdFold) * $Knuth) % 1000000 <
              CAST(floor(r.rate * 1000000) AS BIGINT)
        GROUP BY d.source
      """.stripMargin),
      doc = "temperature-scaled source mixing (n^0.5 rebalance, deterministic keep)"),

    // ---- sharded corpus output manifest ----
    // The write-side contract of the pipeline: the training mix lands as
    // N deterministic shards (shard = hash bucket of doc_id — stable
    // under reruns, independent of row order), and every shard ships
    // with audit counts a consumer can validate against. The manifest IS
    // the oracled query; `Curation.writeSharded` materializes the same
    // assignment as one partitioned parquet write (CurationSpec asserts
    // the files on disk match this manifest row-for-row). Scale: shard
    // count tracks the writer cluster, the manifest is one
    // |shards|-sized aggregate.
    "q94_shard_manifest" -> Q(
      (s, d) => {
        import s.implicits._
        T.documents(s, d)
          .withColumn("shard", pmod(mixed($"doc_id"), lit(NShards)).cast("int"))
          .groupBy($"shard")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("n_chars"),
            min($"doc_id").as("min_doc_id"),
            max($"doc_id").as("max_doc_id"))
      },
      Some(s"""
        SELECT CAST($MixSql % $NShards AS INT) AS shard,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        FROM documents
        GROUP BY 1
      """.stripMargin),
      doc = "sharded-output manifest: per-shard audit counts for the written mix"),

    // ---- benchmark decontamination (n-gram overlap) ----
    // Eval set = every 19th doc (stand-in for a held-out benchmark).
    // Flag each training doc by how many of its distinct word 3-grams
    // appear anywhere in the eval set (production uses 8–13-grams; the
    // fixture vocabulary is ~30 words, so n=3 keeps the overlap
    // distribution non-degenerate). Grams travel as 64-bit NGramHash64
    // values (8-byte keys, not strings); a within-doc collision merging
    // two grams is ~|doc|²/2⁻⁶⁴ — the string-gram oracle stays green.
    // The eval gram set is benchmark-sized → broadcast; the corpus side
    // is scan → explode → hash-agg on doc_id, no corpus-wide shuffle of
    // gram strings.
    "q85_decontaminate" -> Q(
      (s, d) => {
        import s.implicits._
        val grams = T.documents(s, d).select($"doc_id",
          explode(NGramHash64.ngramHashes(TextOps.words($"text"), 3)).as("g"))
        val evalGrams =
          grams.filter($"doc_id" % 19 === 0).select($"g").distinct()
        grams.filter($"doc_id" % 19 =!= 0)
          .join(broadcast(evalGrams), "g")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shared_grams"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ws) - 1),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
          FROM w
        ), ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 19 = 0)
        SELECT doc_id, count(*) AS n_shared_grams
        FROM g JOIN ev USING (g)
        WHERE doc_id % 19 <> 0
        GROUP BY doc_id
      """.stripMargin),
      doc = "benchmark decontamination: training docs sharing eval 3-grams"),

    // ---- Bloom-prefiltered decontamination ----
    // q85's contract by the scale-path physical plan. q85 broadcasts the
    // eval gram set into an exact join — right while the benchmark suite
    // fits executor memory; past broadcast range that join degrades to a
    // corpus-wide shuffle of every exploded gram. This variant builds a
    // Bloom filter over the eval grams ONCE (~1.2 bytes/gram at 1% fpp —
    // an order smaller than the gram set — shipped with the plan as a
    // constant), prunes corpus grams with a codegen'd might_contain
    // projection in the scan stage, and only then runs the exact confirm
    // join on the survivors (the contaminated fraction + fpp of the
    // corpus). False positives die in the confirm join; Bloom filters
    // have no false negatives — the output is row-identical to q85, and
    // the oracle is the same SQL. The confirm join is deliberately
    // unhinted: AQE broadcasts the remnant at test scale and shuffles it
    // at 100 TB, where the shuffle carries ~1% of the gram stream. In a
    // batch ingest loop the filter is built once per benchmark release,
    // so the steady-state cost is the probe projection alone.
    "q96_bloom_decontaminate" -> Q(
      (s, d) => {
        import s.implicits._
        val grams = docGrams(T.documents(s, d))
        // eval side is read 3× (size, build, confirm) — cache the
        // benchmark-sized relation, not the corpus (untracked one-shot
        // scope; batch callers hold the bloom bytes and never rebuild)
        val evalGrams =
          grams.filter($"doc_id" % 19 === 0).select($"g").distinct().persist()
        // production sizes the filter from the benchmark's true gram
        // count — known exactly at build time; undersizing only raises
        // the fpp (more confirm-join work), never breaks exactness
        val bloom = longBloom(evalGrams, "g", math.max(evalGrams.count(), 1L))
        decontaminate(grams.filter($"doc_id" % 19 =!= 0), evalGrams, bloom)
      },
      Some("""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ws) - 1),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
          FROM w
        ), ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 19 = 0)
        SELECT doc_id, count(*) AS n_shared_grams
        FROM g JOIN ev USING (g)
        WHERE doc_id % 19 <> 0
        GROUP BY doc_id
      """.stripMargin),
      doc = "Bloom-prefiltered decontamination: constant-size eval sketch prunes the gram stream before the exact confirm join"),

    // ---- sequence packing into fixed context windows ----
    // Pack docs into 512-token windows the way a training pipeline fills
    // context: shard the corpus deterministically (production: one shard
    // per writer task — shard count scales with the cluster), then within
    // each shard lay docs end-to-end in doc_id order; a doc starts at its
    // shard-local cumulative token offset, its pack is offset/512. The
    // per-shard window is a sorted streaming sum — no global sort, no
    // unpartitioned window. pack_id namespaces packs globally: the shard
    // sits above bit 40 (shard·2⁴⁰ + pack_no), collision-free until a
    // shard exceeds 2⁴⁰ windows ≈ 5.6e14 tokens — the former shard·10⁶
    // namespace overflowed at a mere 512M tokens/shard. 32 shards × 2⁴⁰
    // tops out at 2⁴⁵, far inside the long.
    "q86_sequence_pack" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"shard").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.documents(s, d)
          .select($"doc_id",
            pmod(mixed($"doc_id"), lit(32L)).as("shard"),
            size(TextOps.words($"text")).as("n_tokens"))
          .withColumn("tok_start",
            sum($"n_tokens").over(w) - $"n_tokens")
          .select($"doc_id", $"shard".cast("int").as("shard"),
            (shiftleft($"shard", PackBits) + floor($"tok_start" / 512)).cast("long")
              .as("pack_id"),
            ($"tok_start" % 512).as("pack_offset"),
            $"n_tokens".cast("int").as("n_tokens"))
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, $MixSql % 32 AS shard,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents
        ), cum AS (
          SELECT doc_id, shard, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS tok_start
          FROM base
        )
        SELECT doc_id, CAST(shard AS INT) AS shard,
               -- sum() OVER yields HUGEINT in DuckDB; pin to BIGINT to
               -- match the Spark LongType schema. shard * 2^40 == the
               -- Spark side's shiftleft(shard, 40)
               CAST(shard * ${1L << PackBits} + tok_start // 512 AS BIGINT) AS pack_id,
               CAST(tok_start % 512 AS BIGINT) AS pack_offset,
               CAST(n_tokens AS INT) AS n_tokens
        FROM cum
      """.stripMargin),
      doc = "sequence packing: shard-local 512-token context windows"),

    // ---- deterministic corpus shuffle (training-order assignment) ----
    // Every doc gets a global 1-based training position ordered by
    // (hash, doc_id) — the shuffle-before-pack step of a training
    // pipeline, reproducible across runs because the "randomness" is the
    // doc-id hash, not an RNG. The global order costs one range
    // repartition + per-partition ranks + a partition-count offset join
    // (SurrogateKeys) — NOT a single-task global window; partition count
    // tracks the input splits, so the sort stays fully parallel at
    // 100 TB.
    "q87_corpus_shuffle" -> Q(
      (s, d) => {
        import s.implicits._
        val keyed = T.documents(s, d)
          .select($"doc_id",
            pmod(mixed($"doc_id"), lit(1000000L)).as("shuffle_key"))
        graft.warehouse.SurrogateKeys
          .assign(keyed, Seq("shuffle_key", "doc_id"), "train_pos")
          .select($"doc_id", $"shuffle_key", $"train_pos")
      },
      Some(s"""
        SELECT doc_id, $MixSql % 1000000 AS shuffle_key,
               row_number() OVER (ORDER BY $MixSql % 1000000,
                                  doc_id) AS train_pos
        FROM documents
      """.stripMargin),
      doc = "deterministic corpus shuffle: global hash-ordered training positions"),

    // ---- composite quality filter (C4/Gopher-style keep/drop chain) ----
    // The end-to-end verdict a filtering pipeline actually materializes:
    // every doc gets keep/drop plus the FIRST failing rule (precedence:
    // length → repetition → stopword density), so drop reasons are
    // auditable per rule. One codegen'd projection over the scan — all
    // signals derive from the split words array computed once per row;
    // ratio compares are identical IEEE divisions on both engines.
    "q89_quality_filter" -> Q(
      (s, d) => {
        import s.implicits._
        val ws = TextOps.words($"text")
        val nWords = size(ws)
        val dupRatio =
          lit(1.0) - size(TextOps.distinctWords($"text")).cast("double") / nWords
        val stopRatio =
          TextOps.vocabHits($"text", Seq("the", "a", "of", "and", "or"))
            .cast("double") / nWords
        val reason = when(nWords < 20, "too_short")
          .when(dupRatio > 0.6, "repetitive")
          .when(stopRatio < 0.01, "low_stopword")
          .otherwise("ok")
        T.documents(s, d).select(
          $"doc_id", nWords.as("n_words"),
          (reason === "ok").as("keep"), reason.as("drop_reason"))
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_words,
                 1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS dup_ratio,
                 CAST(len(list_filter(string_split(text, ' '),
                   w -> list_contains(['the','a','of','and','or'], w))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
          FROM documents
        )
        SELECT doc_id, CAST(n_words AS INT) AS n_words,
               (CASE WHEN n_words < 20 THEN 'too_short'
                     WHEN dup_ratio > 0.6 THEN 'repetitive'
                     WHEN stop_ratio < 0.01 THEN 'low_stopword'
                     ELSE 'ok' END) = 'ok' AS keep,
               CASE WHEN n_words < 20 THEN 'too_short'
                    WHEN dup_ratio > 0.6 THEN 'repetitive'
                    WHEN stop_ratio < 0.01 THEN 'low_stopword'
                    ELSE 'ok' END AS drop_reason
        FROM m
      """.stripMargin),
      doc = "composite quality filter: keep/drop + first-failing rule"),

    // ---- end-to-end curation pipeline: one disposition per document ----
    // The whole raw-crawl → training-mix decision chain as ONE Catalyst
    // plan: eval-set carve-out → quality keep/drop chain (q89's rules) →
    // exact-dedup keeper election (q54) → benchmark decontamination
    // (q85's gram rule) → deterministic split (q91). This disposition
    // table is what a real pipeline materializes per batch; declaring the
    // whole chain in one plan lets Catalyst share the documents scan
    // across the signal families instead of five separate pipeline jobs
    // re-reading the corpus. Precedence is documented and auditable:
    // eval > quality > duplicate > contaminated > kept. Dedup elects over
    // ALL docs — an eval doc can be the keeper; its training-side twin is
    // then 'duplicate' (it would fall to 'contaminated' anyway, sharing
    // every gram).
    // Scale: quality signals are a scan projection; keeper election one
    // hash aggregate on the text fingerprint; contamination is gram
    // explode → broadcast semi-join → doc-keyed distinct (q85's shape —
    // benchmarks are small by nature); the split is a pure projection.
    // Nothing concentrates; the only corpus-wide exchanges are the
    // fingerprint aggregate/join (32-byte keys) and the doc-keyed
    // contamination flag.
    "q109_curation_pipeline" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = T.documents(s, d)
        val ws = TextOps.words($"text")
        val nWords = size(ws)
        val dupRatio =
          lit(1.0) - size(TextOps.distinctWords($"text")).cast("double") / nWords
        val stopRatio =
          TextOps.vocabHits($"text", Seq("the", "a", "of", "and", "or"))
            .cast("double") / nWords
        val qReason = when(nWords < 20, "too_short")
          .when(dupRatio > 0.6, "repetitive")
          .when(stopRatio < 0.01, "low_stopword")
        val keeper = docs.groupBy(md5($"text").as("fp"))
          .agg(min($"doc_id").as("k_doc"))
        // 5-grams, not q85's 3-grams: the binary contaminated/clean flag
        // needs specific overlap — on the ~30-word fixture vocabulary a
        // shared 3-gram taints half the corpus (degenerate: zero docs
        // would reach 'kept'), while a shared 5-gram marks ~3% (the
        // production 8–13-gram rule scaled to fixture doc lengths)
        val grams = docs.select($"doc_id",
          explode(NGramHash64.ngramHashes(TextOps.words($"text"), 5)).as("g"))
        val evalGrams = grams.filter($"doc_id" % 19 === 0).select($"g").distinct()
        val tainted = grams.filter($"doc_id" % 19 =!= 0)
          .join(broadcast(evalGrams), "g").select($"doc_id").distinct()
          .withColumn("tainted", lit(true))
        val bucket = pmod(mixed($"doc_id"), lit(100L))
        val disposition = when($"doc_id" % 19 === 0, "eval")
          .otherwise(coalesce(qReason,
            when($"doc_id" =!= $"k_doc", "duplicate"),
            when($"tainted", "contaminated"),
            lit("kept")))
        docs.withColumn("fp", md5($"text"))
          .join(keeper, Seq("fp"))
          .join(tainted, Seq("doc_id"), "left")
          .select($"doc_id", nWords.as("n_words"),
            disposition.as("disposition"),
            when(disposition === "kept",
              when(bucket < 98, "train").when(bucket === 98, "val")
                .otherwise("test")).as("split"))
      },
      Some(s"""
        WITH m AS (
          SELECT doc_id, text,
                 len(string_split(text, ' ')) AS n_words,
                 1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS dup_ratio,
                 CAST(len(list_filter(string_split(text, ' '),
                   w -> list_contains(['the','a','of','and','or'], w))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
          FROM documents
        ), k AS (
          SELECT md5(text) AS fp, min(doc_id) AS k_doc
          FROM documents GROUP BY 1
        ), w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ws) - 3),
            i -> array_to_string(ws[i:i+4], ' ')))) AS g
          FROM w
        ), ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 19 = 0
        ), c AS (
          SELECT DISTINCT g.doc_id FROM g JOIN ev USING (g)
          WHERE doc_id % 19 <> 0
        ), base AS (
          SELECT m.doc_id, m.n_words,
                 CASE WHEN m.doc_id % 19 = 0 THEN 'eval'
                      WHEN m.n_words < 20 THEN 'too_short'
                      WHEN m.dup_ratio > 0.6 THEN 'repetitive'
                      WHEN m.stop_ratio < 0.01 THEN 'low_stopword'
                      WHEN m.doc_id <> k.k_doc THEN 'duplicate'
                      WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                      ELSE 'kept' END AS disposition
          FROM m JOIN k ON md5(m.text) = k.fp
          LEFT JOIN c ON m.doc_id = c.doc_id
        )
        SELECT doc_id, CAST(n_words AS INT) AS n_words, disposition,
               CASE WHEN disposition = 'kept' THEN
                 CASE WHEN $MixSql % 100 < 98 THEN 'train'
                      WHEN $MixSql % 100 = 98 THEN 'val'
                      ELSE 'test' END END AS split
        FROM base
      """.stripMargin),
      doc = "end-to-end curation pipeline: eval/quality/dedup/decontaminate/split disposition per doc")
  )
}
