package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-derived link graph: extract href targets from page markup,
  * normalize them to hosts, and rank the resulting HOST graph — the
  * crawl-frontier pipeline the synthetic-regular graph of
  * [[Graph]] (q153/q158) cannot exercise. Real link graphs are STRINGLY
  * (hosts need case/www/port normalization), SKEWED (host in-degree
  * follows content-term frequency, not a multiplicative hash), and have
  * VARIABLE out-degree (the constant-OutDegree division of q153 does
  * not apply) — all three now first-class here.
  *
  * The corpus tables carry no markup, so pages are SYNTHESIZED
  * deterministically from `documents.text`: every [[LinkEvery]]-th
  * token becomes an anchor to `http://<token>.example.com/p<i>`, and
  * every [[WwwEvery]]-th additionally carries the three classic
  * normalization hazards (uppercase scheme, `www.` prefix, an explicit
  * port). The ORACLE derives the expected edge list directly from token
  * positions — independently of the markup round-trip — so a hash match
  * PROVES extraction + normalization exactly invert the decoration; an
  * unstripped `www.` or port would surface as a row mismatch.
  *
  * Scale shape: extraction is map-only (regexp over the page column —
  * no shuffle until the edge aggregate); the host graph is ranked with
  * the same exact-integer damped update as q153 but with PER-SOURCE
  * out-degree (`r DIV od`), the general form. Host-keyed joins shuffle
  * strings here; a 10^9-host production run dictionary-encodes hosts to
  * dense longs first (one distinct + id-assign pass, the q20 surrogate
  * pipeline) and buckets the edge table by src so per-round cost stays
  * rank-vector-sized — the layout already pinned for q153 in GraphSpec.
  * Dangling hosts (no out-links — word-hosts never link anywhere) bottom
  * out at the teleport floor via the same left join, and their mass is
  * dropped, matching [[Graph]]'s convention.
  */
object LinkGraph extends QueryPack {

  /** Every LinkEvery-th token (0-based) becomes an anchor. */
  val LinkEvery = 7

  /** Every WwwEvery-th token's anchor carries scheme-case/www/port
    * decoration — the normalization hazards. */
  val WwwEvery = 14

  /** Deterministic page markup per document: tokens joined back with
    * single spaces, link positions wrapped in `<a href=...>` anchors.
    * Pure per-row expressions — map-only, no shuffle. */
  def pages(docs: DataFrame): DataFrame = {
    def anchor(w: Column, i: Column): Column = {
      val plain = concat(lit("<a href=\"http://"), w,
        lit(".example.com/p"), i.cast("string"), lit("\">"), w, lit("</a>"))
      val hazard = concat(lit("<a href=\"HTTP://www."), w,
        lit(".example.com:8080/p"), i.cast("string"), lit("\">"), w,
        lit("</a>"))
      when(i % WwwEvery === 0, hazard)
        .when(i % LinkEvery === 0, plain)
        .otherwise(w)
    }
    docs.select(col("doc_id"), col("source"),
      concat(lit("<html><body>"),
        array_join(transform(split(col("text"), " "),
          (w, i) => anchor(w, i)), " "),
        lit("</body></html>")).as("html"))
  }

  /** The extraction operator under test: pull every href host out of
    * the markup and normalize it — lowercase, strip a leading `www.`,
    * strip an explicit port. One row per link OCCURRENCE (a host linked
    * twice from one page counts twice — in-degree is a frequency
    * signal). Map-only: regexp + explode, no shuffle. */
  def extractLinks(pages: DataFrame): DataFrame =
    pages.select(col("doc_id").as("src_doc"),
      explode(expr(
        """regexp_extract_all(html, '(?i)href="https?://([^/"]+)', 1)"""))
        .as("raw"))
      .select(col("src_doc"),
        regexp_replace(regexp_replace(lower(col("raw")),
          "^www\\.", ""), ":[0-9]+$", "").as("dst_host"))

  /** Distinct (src_host, dst_host) edges of the host graph: a document's
    * own host is `<source>.example.com`, its targets are the extracted
    * hosts; self-loops dropped. */
  def hostEdges(docs: DataFrame): DataFrame =
    extractLinks(pages(docs))
      .join(docs.select(col("doc_id").as("src_doc"),
        concat(col("source"), lit(".example.com")).as("src")), "src_doc")
      .select(col("src"), col("dst_host").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** One damped integer round with PER-SOURCE out-degree: contributions
    * `r DIV od` summed per dst (map-side partial agg), teleport floor
    * via left join — [[Graph.step]] generalized past the constant
    * OutDegree of the derived graph. `edges` must carry (src, dst, od). */
  def stepVarDeg(nodes: DataFrame, edges: DataFrame,
                 ranks: DataFrame): DataFrame = {
    val inc = edges
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst"))
      .agg(sum(expr("r DIV od")).as("inc"))
    nodes.join(inc, nodes("node") === inc("dst"), "left")
      .select(nodes("node"),
        (lit(Graph.Scale * 15 / 100) +
          expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")).as("r"))
  }

  /** Edges joined with their per-source out-degree, materialized once:
    * the table is consumed by every damped round, and re-deriving it
    * would re-run the regexp extraction per round (at scale: the
    * orient-once-persist discipline of the q158 edge table). */
  private def withOutDeg(edges: DataFrame): DataFrame =
    edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("od")), "src")
      .localCheckpoint()

  private def hostNodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()

  /** [[Graph.Iterations]] exact-integer rounds over the extracted host
    * graph from uniform mass; returns (node, r) for every host. */
  def pagerankHosts(spark: SparkSession, docs: DataFrame): DataFrame = {
    val e = withOutDeg(hostEdges(docs))
    val nodes = hostNodes(e)
    val r0 = nodes.select(col("node"), lit(Graph.Scale).as("r"))
    (1 to Graph.Iterations).foldLeft(r0)((r, _) => stepVarDeg(nodes, e, r))
  }

  /** Rank maintenance on the content-derived graph — the incremental-
    * registry family member (q157's shape) where the APPEND is a doc
    * batch whose links haven't been extracted before: ranks converged on
    * the base graph (docs with doc_id % BatchMod ≠ 0) are the stored
    * registry; landing the batch re-runs extraction over the NEW docs
    * only (in production the batch scan — here expressed as the
    * complementary filter) and warm-starts [[Graph.IncrRounds]] damped
    * rounds over the full edge table. Node universe is the full graph's
    * hosts, so pre-append hosts only the batch links to sit at the
    * teleport floor in the stored registry — an empty registry row.
    * Out-degrees are PER-PHASE (the base graph's own od, then the full
    * graph's), exactly what a real append changes. */
  def pagerankHostsIncremental(spark: SparkSession,
                               docs: DataFrame): DataFrame = {
    val eAll = withOutDeg(hostEdges(docs))
    val eBase = withOutDeg(hostEdges(
      docs.filter(pmod(col("doc_id"), lit(Graph.BatchMod.toLong)) =!= 0L)))
    val nodes = hostNodes(eAll)
    val r0 = nodes.select(col("node"), lit(Graph.Scale).as("r"))
    val rBase = (1 to Graph.Iterations)
      .foldLeft(r0)((r, _) => stepVarDeg(nodes, eBase, r))
    (1 to Graph.IncrRounds)
      .foldLeft(rBase)((r, _) => stepVarDeg(nodes, eAll, r))
  }

  /** Synchronous label-propagation rounds for q167; fixed so the
    * oracle unrolls. */
  val LpaRounds = 3

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007) over the UNDIRECTED host graph — the site-clustering
    * signal (mirror families, link farms, topical hubs). Every node
    * starts as its own label; per round each node adopts the MOST
    * FREQUENT label among its neighbors, ties broken by the smaller
    * label — the deterministic variant, expressed as min(struct(-count,
    * label)) so the pick is one map-side-combined aggregate, never a
    * per-node sort. Synchronous + deterministic tie-break makes the
    * fixed-round result exactly replayable (async LPA is run-order
    * dependent — useless under a hash oracle). Per round: one shuffle
    * join of the label vector into the static symmetrized edges, one
    * (node,label) count, one per-node argmin, one left join back —
    * all label-vector-sized. Min-LABEL propagation (q79's connected
    * components) is the degenerate all-ties case; mode propagation
    * keeps dense communities from being absorbed through a single
    * bridge edge. */
  def lpaCommunities(spark: SparkSession, docs: DataFrame): DataFrame = {
    val e = hostEdges(docs)
    val sym = e.unionByName(e.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct().localCheckpoint()
    val nodes = hostNodes(sym)
    lpaLoop(sym, nodes.select(col("node"), col("node").as("label")),
      LpaRounds)
  }

  /** The voting loop of [[lpaCommunities]], factored over an arbitrary
    * SYMMETRIZED (src, dst) edge table and an initial (node, label)
    * frame. Exposed for hand-graph property tests. */
  def lpaLoop(sym: DataFrame, l0: DataFrame, rounds: Int): DataFrame =
    (1 to rounds).foldLeft(l0) { (lab, _) =>
      val votes = sym
        .join(lab.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      val pick = votes.groupBy(col("dst"))
        .agg(min(struct((col("c") * lit(-1L)).as("nc"),
          col("label").as("l"))).as("m"))
        .select(col("dst"), col("m.l").as("vote"))
      lab.join(pick, lab("node") === pick("dst"), "left")
        .select(lab("node"),
          coalesce(col("vote"), lab("label")).as("label"))
    }

  /** Canonicalize one URL column — the crawl-frontier normalizer that
    * decides whether two discovered URLs are the SAME page (the dedup
    * key of the frontier, run once per discovered link, so it must be
    * map-only): strip the fragment, lowercase scheme+host, strip a
    * leading `www.`, strip the scheme's DEFAULT port only (`:80` for
    * http, `:443` for https — `https://x:80` keeps its odd port), drop
    * tracking params (`utm_*`, `gclid`, `fbclid`), and sort the
    * surviving query params for order-independence. Path case is
    * preserved (paths are case-sensitive). Pure string expressions —
    * no shuffle, codegen-friendly. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val qstr = regexp_extract(noFrag, "\\?(.*)$", 1)
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val headRaw = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    val path = regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    val head = regexp_replace(
      regexp_replace(
        regexp_replace(lower(headRaw), "^(https?://)www\\.", "$1"),
        "^(http://[^/:]+):80$", "$1"),
      "^(https://[^/:]+):443$", "$1")
    val kept = filter(split(qstr, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || (p === "")))
    val q = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&"))).otherwise(lit(""))
    concat(head, path, q)
  }

  /** Deterministically messy URLs per document — every hazard the
    * canonicalizer must undo: uppercase scheme, mixed-case www host,
    * the scheme's default port, tracking params around real ones in
    * scrambled order, a fragment. Docs ≡ 0 (mod 3) carry ONLY tracking
    * params (canonical form has no query at all). */
  def messyUrls(docs: DataFrame): DataFrame = {
    val even = pmod(col("doc_id"), lit(2L)) === 0L
    docs.select(col("doc_id"), concat(
      when(even, lit("HTTP://WWW.")).otherwise(lit("HTTPS://www.")),
      initcap(col("source")), lit(".Example.COM"),
      when(even, lit(":80")).otherwise(lit(":443")),
      lit("/Docs/"), col("doc_id"),
      when(pmod(col("doc_id"), lit(3L)) === 0L,
        lit("?utm_source=feed&gclid=xyz"))
        .otherwise(concat(lit("?utm_source=feed&b="), col("lang"),
          lit("&a="), col("n_chars"))),
      lit("#s"), col("doc_id")).as("url"))
  }

  /** Oracle: expected links derived DIRECTLY from token positions —
    * independent of the markup round-trip the Spark side performs. */
  private val linksSql: String = s"""
        doc_words AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        toks AS (
          SELECT doc_id, ws,
                 unnest(generate_series(1, len(ws))) AS i
          FROM doc_words
        ),
        links AS (
          SELECT doc_id AS src_doc, ws[i] || '.example.com' AS dst_host
          FROM toks WHERE (i - 1) % $LinkEvery = 0
        )"""

  /** Generated damped rounds over the host graph, per-source out-degree
    * (`r // od`), every integer expression CAST to BIGINT (DuckDB types
    * sum(BIGINT) as HUGEINT — the q153 r13 lesson). Steps from `<from>`
    * over `<edgeCte>` (which must carry src, dst, od), emitting CTEs
    * `<prefix>1..<prefix>rounds`. */
  private def vdStepsSql(edgeCte: String, from: String, prefix: String,
                         rounds: Int): String =
    (1 to rounds).map { i =>
      val prev = if (i == 1) from else s"$prefix${i - 1}"
      s""",
        ${prefix}i$i AS (
          SELECT e.dst AS dst, CAST(sum(r.r // e.od) AS BIGINT) AS inc
          FROM $edgeCte e JOIN $prev r ON e.src = r.node GROUP BY 1
        ),
        $prefix$i AS (
          SELECT nodes.node,
                 CAST(${Graph.Scale * 15 / 100}
                      + (85 * coalesce(inc, 0)) // 100 AS BIGINT) AS r
          FROM nodes LEFT JOIN ${prefix}i$i ON nodes.node = ${prefix}i$i.dst
        )"""
    }.mkString

  /** Full HITS iterations over the extracted host graph. */
  val HitsRounds = 2

  /** Kleinberg's HITS (hubs & authorities) — the OTHER classic link
    * signal: source-hosts that link to many strong word-hosts are hubs,
    * word-hosts linked from many strong hubs are authorities. Run
    * UNNORMALIZED in exact integer arithmetic for a FIXED [[HitsRounds]]
    * rounds (hash-oracle-able; the ranking is what matters and scaling
    * is monotone). Each half-round is one shuffle join of the score
    * vector into the static edge table + a map-side-combined group-by —
    * the q153 static-edges/moving-vector split. Unnormalized growth is
    * the honest limit: scores multiply by ~(d_in·d_out) per round, so at
    * web degrees (~10^6) BIGINT overflows after ~3 rounds — a production
    * run renormalizes per round (float, losing the exact oracle) or
    * right-shifts by a fixed per-round exponent (integer, keeping it);
    * at this catalog's degrees the 2-round values stay far inside the
    * headroom, and the bound is stated rather than silently wrapped. */
  def hitsHosts(spark: SparkSession, docs: DataFrame): DataFrame = {
    val e = hostEdges(docs).localCheckpoint()
    val nodes = hostNodes(e)
    var h = nodes.select(col("node"), lit(1L).as("h"))
    var a = nodes.select(col("node"), lit(0L).as("a"))
    for (_ <- 1 to HitsRounds) {
      val ain = e.join(h.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("s"))
      a = nodes.join(ain, nodes("node") === ain("dst"), "left")
        .select(nodes("node"), coalesce(col("s"), lit(0L)).as("a"))
      val hout = e.join(a.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("s"))
      h = nodes.join(hout, nodes("node") === hout("src"), "left")
        .select(nodes("node"), coalesce(col("s"), lit(0L)).as("h"))
    }
    h.select(col("node"), col("h").as("hub"))
      .join(a.select(col("node"), col("a").as("auth")), "node")
  }

  /** Generated HITS CTE rounds: a<i> from h<i-1> over in-edges, h<i>
    * from a<i> over out-edges — the same loop as [[hitsHosts]]. */
  private def hitsSql(rounds: Int): String =
    (1 to rounds).map { i =>
      s""",
        ai$i AS (
          SELECT e.dst AS dst, CAST(sum(h.h) AS BIGINT) AS s
          FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1
        ),
        a$i AS (
          SELECT nodes.node, CAST(coalesce(s, 0) AS BIGINT) AS a
          FROM nodes LEFT JOIN ai$i ON nodes.node = ai$i.dst
        ),
        hi$i AS (
          SELECT e.src AS src, CAST(sum(a.a) AS BIGINT) AS s
          FROM e JOIN a$i a ON e.dst = a.node GROUP BY 1
        ),
        h$i AS (
          SELECT nodes.node, CAST(coalesce(s, 0) AS BIGINT) AS h
          FROM nodes LEFT JOIN hi$i ON nodes.node = hi$i.src
        )"""
    }.mkString

  /** Shared oracle fragment: the distinct host edge list + node set
    * derived from token positions (independent of the markup). */
  private val hostGraphSql: String = s"""$linksSql,
        edges AS (
          SELECT DISTINCT d.source || '.example.com' AS src, l.dst_host AS dst
          FROM links l JOIN documents d ON d.doc_id = l.src_doc
          WHERE d.source || '.example.com' <> l.dst_host
        ),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        )"""

  /** Generated synchronous-LPA rounds — mode with (count desc, label
    * asc) tie-break, the SQL twin of [[lpaCommunities]]'s min(struct).
    * Steps from `<from>` over edge CTE `<edge>` (symmetrized),
    * emitting `<prefix>1..<prefix>N`. */
  private def lpaSql(edge: String, from: String, prefix: String,
                     rounds: Int): String =
    (1 to rounds).map { i =>
      val prev = if (i == 1) from else s"$prefix${i - 1}"
      s""",
        ${prefix}v$i AS (
          SELECT s.dst AS node, l.label AS cand, count(*) AS c
          FROM $edge s JOIN $prev l ON s.src = l.node GROUP BY 1, 2
        ),
        ${prefix}w$i AS (
          SELECT node, cand,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY c DESC, cand) AS rk
          FROM ${prefix}v$i
        ),
        $prefix$i AS (
          SELECT p.node, coalesce(w.cand, p.label) AS label
          FROM $prev p
          LEFT JOIN (SELECT node, cand FROM ${prefix}w$i WHERE rk = 1) w
            ON p.node = w.node
        )"""
    }.mkString

  /** Warm-start rounds for q177. */
  val LpaIncrRounds = 2

  /** Incremental LPA maintenance — the registry-family member on
    * labels: communities converged on the BASE docs' host graph are
    * the stored registry; a doc-batch append adds edges (and possibly
    * hosts), and [[LpaIncrRounds]] warm-started voting rounds over the
    * FULL symmetrized graph maintain the labeling — batch-new hosts
    * enter as their own label (the cold rule). Unlike BFS distances,
    * label updates are NOT monotone under edge additions, so
    * maintenance is a fixed-round re-vote from the stored state rather
    * than a provable-upper-bound refinement — the honest contract, and
    * the same one production LPA maintenance ships (labels stabilize
    * in practice because most of the graph is unchanged). */
  def lpaCommunitiesIncremental(spark: SparkSession,
                                docs: DataFrame): DataFrame = {
    def symOf(d: DataFrame): DataFrame = {
      val e = hostEdges(d)
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
    }
    val symAll = symOf(docs)
    val symBase = symOf(
      docs.filter(pmod(col("doc_id"), lit(Graph.BatchMod.toLong)) =!= 0L))
    val baseNodes = hostNodes(symBase)
    val stored = lpaLoop(symBase,
      baseNodes.select(col("node"), col("node").as("label")), LpaRounds)
    val warm = hostNodes(symAll)
      .join(stored.withColumnRenamed("label", "blabel"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("blabel"), col("node")).as("label"))
    lpaLoop(symAll, warm, LpaIncrRounds)
  }

  def queries: Map[String, Q] = Map(
    // Full extracted edge list, one row per link occurrence. The oracle
    // never sees the markup: a hash match proves the regexp + host
    // normalization exactly invert the deterministic decoration
    // (uppercase scheme, www., port) planted on every WwwEvery-th token.
    "q159_link_extract" -> Q(
      (s, d) => extractLinks(pages(T.documents(s, d))),
      Some(s"""
        WITH $linksSql
        SELECT src_doc, dst_host FROM links
      """.stripMargin),
      doc = "Link extraction: regexp href harvest + host normalization " +
        "(case/www/port) over deterministic markup; oracle derives the " +
        "edge list independently of the round-trip"),

    // Exact-integer PageRank over the extracted HOST graph — stringly
    // nodes, variable out-degree, content-frequency skew. Full rank
    // vector oracled bit-for-bit.
    "q160_linkrank_hosts" -> Q(
      (s, d) => pagerankHosts(s, T.documents(s, d)),
      Some(s"""
        WITH $linksSql,
        edges AS (
          SELECT DISTINCT d.source || '.example.com' AS src, l.dst_host AS dst
          FROM links l JOIN documents d ON d.doc_id = l.src_doc
          WHERE d.source || '.example.com' <> l.dst_host
        ),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        od AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
        e AS (SELECT edges.src, edges.dst, od.od
              FROM edges JOIN od USING (src)),
        r0 AS (SELECT node, CAST(${Graph.Scale} AS BIGINT) AS r
               FROM nodes)${vdStepsSql("e", "r0", "r", Graph.Iterations)}
        SELECT node, r FROM r${Graph.Iterations}
      """.stripMargin),
      doc = "Damped integer PageRank over the content-extracted host " +
        "graph: per-source out-degree division, string host keys, " +
        "teleport floor; full rank vector oracled bit-for-bit"),

    // Registry maintenance on the content-derived graph: stored ranks
    // converged on the base docs' links, then a doc-batch append
    // re-extracts only the new docs and warm-starts IncrRounds rounds
    // over the full edges with the full graph's out-degrees. Two-phase
    // integer drive oracled bit-for-bit.
    "q161_linkrank_incremental" -> Q(
      (s, d) => pagerankHostsIncremental(s, T.documents(s, d)),
      Some(s"""
        WITH $linksSql,
        edges AS (
          SELECT DISTINCT d.source || '.example.com' AS src, l.dst_host AS dst
          FROM links l JOIN documents d ON d.doc_id = l.src_doc
          WHERE d.source || '.example.com' <> l.dst_host
        ),
        edgesb AS (
          SELECT DISTINCT d.source || '.example.com' AS src, l.dst_host AS dst
          FROM links l JOIN documents d ON d.doc_id = l.src_doc
          WHERE d.doc_id % ${Graph.BatchMod} <> 0
            AND d.source || '.example.com' <> l.dst_host
        ),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        odf AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
        ef AS (SELECT edges.src, edges.dst, odf.od
               FROM edges JOIN odf USING (src)),
        odb AS (SELECT src, count(*) AS od FROM edgesb GROUP BY 1),
        eb AS (SELECT edgesb.src, edgesb.dst, odb.od
               FROM edgesb JOIN odb USING (src)),
        r0 AS (SELECT node, CAST(${Graph.Scale} AS BIGINT) AS r
               FROM nodes)${vdStepsSql("eb", "r0", "b", Graph.Iterations)}${
          vdStepsSql("ef", s"b${Graph.Iterations}", "f", Graph.IncrRounds)}
        SELECT node, r FROM f${Graph.IncrRounds}
      """.stripMargin),
      doc = "Incremental link-rank: stored base-graph host ranks + " +
        "warm-started rounds after a doc-batch append changes both the " +
        "edge set and the per-source out-degrees; oracled bit-for-bit"),

    // Frontier URL canonicalization: the oracle CONSTRUCTS the expected
    // canonical form directly from the row's columns — independent of
    // the parse — so a hash match proves the normalizer exactly undoes
    // every planted hazard (case, www, default port, tracking params,
    // param order, fragment) and keeps what it must (path case, the
    // non-default-port case lives in LinkGraphSpec).
    "q163_url_canonicalize" -> Q(
      (s, d) => {
        val m = messyUrls(T.documents(s, d))
        m.select(col("doc_id"), canonicalizeUrl(col("url")).as("url"))
      },
      Some("""
        SELECT doc_id,
               concat(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END,
                      '://', source, '.example.com/Docs/', doc_id,
                      CASE WHEN doc_id % 3 = 0 THEN ''
                           ELSE concat('?a=', n_chars, '&b=', lang) END)
                 AS url
        FROM documents
      """.stripMargin),
      doc = "URL canonicalization (frontier dedup key): strip fragment/" +
        "www/default port/tracking params, lowercase scheme+host, sort " +
        "query params, preserve path case; map-only string expressions, " +
        "oracle constructs the expected form independently"),

    // Synchronous deterministic label propagation over the undirected
    // host graph: mode-of-neighbors with (count desc, label asc)
    // tie-break, full (node, label) vector oracled bit-for-bit.
    "q167_lpa_communities" -> Q(
      (s, d) => lpaCommunities(s, T.documents(s, d)),
      Some(s"""
        WITH $hostGraphSql,
        sym AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges
          )
        ),
        l0 AS (SELECT node, node AS label FROM nodes)${
          lpaSql("sym", "l0", "l", LpaRounds)}
        SELECT node, label FROM l$LpaRounds
      """.stripMargin),
      doc = "LPA communities (Raghavan et al.): synchronous mode-of-" +
        "neighbors label propagation with deterministic min tie-break " +
        "over the symmetrized host graph; label-vector-sized shuffles " +
        "per round, final labeling oracled bit-for-bit"),

    // Warm-started LPA after a doc-batch append: stored base-graph
    // labels + LpaIncrRounds re-votes over the full symmetrized graph;
    // batch-new hosts enter as their own label. Full labeling oracled.
    "q177_lpa_incremental" -> Q(
      (s, d) => lpaCommunitiesIncremental(s, T.documents(s, d)),
      Some(s"""
        WITH $hostGraphSql,
        edgesb AS (
          SELECT DISTINCT d.source || '.example.com' AS src, l.dst_host AS dst
          FROM links l JOIN documents d ON d.doc_id = l.src_doc
          WHERE d.doc_id % ${Graph.BatchMod} <> 0
            AND d.source || '.example.com' <> l.dst_host
        ),
        nodesb AS (
          SELECT src AS node FROM edgesb UNION SELECT dst FROM edgesb
        ),
        sym AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges
          )
        ),
        symb AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edgesb
            UNION ALL SELECT dst AS src, src AS dst FROM edgesb
          )
        ),
        bl0 AS (SELECT node, node AS label FROM nodesb)${
          lpaSql("symb", "bl0", "bl", LpaRounds)},
        w0 AS (
          SELECT n.node, coalesce(b.label, n.node) AS label
          FROM nodes n LEFT JOIN bl$LpaRounds b ON n.node = b.node
        )${lpaSql("sym", "w0", "f", LpaIncrRounds)}
        SELECT node, label FROM f$LpaIncrRounds
      """.stripMargin),
      doc = "Incremental LPA: base-graph community labels stored as " +
        "the registry, a doc-batch append adds edges/hosts, and " +
        "fixed warm-started re-votes over the full graph maintain the " +
        "labeling (label updates are not monotone — the honest " +
        "fixed-round contract); oracled bit-for-bit"),

    // HITS over the extracted host graph: exact-integer unnormalized
    // rounds, full (node, hub, auth) vector oracled bit-for-bit.
    "q164_hits_hosts" -> Q(
      (s, d) => hitsHosts(s, T.documents(s, d)),
      Some(s"""
        WITH $linksSql,
        edges AS (
          SELECT DISTINCT d.source || '.example.com' AS src, l.dst_host AS dst
          FROM links l JOIN documents d ON d.doc_id = l.src_doc
          WHERE d.source || '.example.com' <> l.dst_host
        ),
        e AS (SELECT src, dst FROM edges),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes)${
          hitsSql(HitsRounds)}
        SELECT h$HitsRounds.node, h$HitsRounds.h AS hub,
               a$HitsRounds.a AS auth
        FROM h$HitsRounds JOIN a$HitsRounds USING (node)
      """.stripMargin),
      doc = "Kleinberg HITS over the content-extracted host graph: " +
        "exact-integer unnormalized hub/authority rounds (static edges, " +
        "score-vector-only shuffle per half-round); full vector oracled " +
        "bit-for-bit")
  )
}
