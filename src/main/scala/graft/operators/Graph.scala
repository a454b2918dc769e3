package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl prioritization — the one graph-shaped
  * workload a crawl pipeline runs that the catalog's connected-components
  * tier (q79/q135) doesn't cover: damped PageRank over the host/document
  * link graph, the classic crawl-frontier ranking signal (what Common
  * Crawl publishes as its host-level rank files).
  *
  * The corpus tables carry no link column, so the graph is DERIVED
  * deterministically: node = doc_id mod n, and each node emits
  * [[OutDegree]] links dst_j = (node·A + j) mod n (A = Knuth's 2654435761
  * multiplicative-hash constant). Both engines replay the same integer
  * arithmetic, so the edge list — and everything downstream — is exact.
  *
  * PageRank itself is run in EXACT INTEGER arithmetic: ranks are scaled
  * longs (initial mass [[Scale]] per node), a node's contribution per
  * out-link is `r DIV outDegree`, and the damped update is
  * `(15·Scale) DIV 100 + (85·incoming) DIV 100`. Integer sums are
  * order-independent, which is what makes a hash-exact DuckDB oracle
  * possible where float PageRank would drift in the last ulps; the DIVs
  * lose deterministic sub-integer mass exactly like production fixed-point
  * implementations (e.g. Pregel-style integer rank used when reducers must
  * be associative-exact). Dangling mass convention: incoming contributions
  * addressed to a dst that is not a node (possible only if doc_ids are
  * non-contiguous) are dropped, and a node with no in-links bottoms out at
  * the teleport floor `15% · Scale`.
  *
  * Scale shape (the 100 TB question): the edge table is STATIC across
  * iterations — only the rank vector moves. Each of the [[Iterations]]
  * unrolled rounds is one shuffle of n rank rows into the edge join plus
  * one map-side-combined `groupBy(dst)` of the contributions; the edges
  * themselves are re-derived per round here (they're a projection of the
  * scan — cheaper than caching at this size), while a production run over
  * a real 10^11-edge graph writes edges ONCE bucketed by `src` so the join
  * never exchanges the edge side (the q80 bucketed-join layout;
  * GraphSpec pins the rank-side-only exchange on that variant) and
  * truncates lineage with `localCheckpoint` every few rounds exactly as
  * the crawl loop does (Crawl.scala). 85·incoming stays far from Long
  * overflow: total mass is n·Scale, so the headroom bound is
  * n < Long.Max/(85·Scale) ≈ 10^12 nodes at the default Scale.
  */
object Graph extends QueryPack {

  /** Out-links derived per node. */
  val OutDegree = 4

  /** Integer rank mass per node at iteration 0. */
  val Scale = 1000000L

  /** Unrolled damped-update rounds in the catalog entry. */
  val Iterations = 3

  /** Knuth multiplicative-hash constant — spreads dst over [0, n). */
  val A = 2654435761L

  /** (nodes, edges) of the derived link graph: nodes = (node, n) — the
    * mod base rides along so edge derivation needs no second aggregate —
    * and edges = (src, dst) with exactly [[OutDegree]] out-links per node.
    * The one-row count is broadcast; no driver collect. */
  def linkGraph(spark: SparkSession, docs: DataFrame): (DataFrame, DataFrame) = {
    val n = docs.agg(count(lit(1)).as("n"))
    val nodes = docs.crossJoin(broadcast(n))
      .select(pmod(col("doc_id"), col("n")).as("node"), col("n"))
      .distinct()
    val js = spark.range(OutDegree).select(col("id").as("j"))
    val edges = nodes.crossJoin(broadcast(js))
      .select(col("node").as("src"),
        pmod(col("node") * lit(A) + col("j"), col("n")).as("dst"))
    (nodes.select(col("node")), edges)
  }

  /** One damped integer PageRank round: contributions r DIV outDeg are
    * summed per dst (map-side partial agg), then every node — including
    * in-link-less ones, via the left join — gets the teleport floor plus
    * 85% of its incoming mass. */
  def step(nodes: DataFrame, edges: DataFrame, ranks: DataFrame): DataFrame = {
    val inc = edges
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst"))
      .agg(sum(expr(s"r DIV $OutDegree")).as("inc"))
    nodes.join(inc, nodes("node") === inc("dst"), "left")
      .select(col("node"),
        (lit(Scale * 15 / 100) +
          expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")).as("r"))
  }

  /** [[Iterations]] rounds from uniform mass; returns (node, r). */
  def pagerank(spark: SparkSession, docs: DataFrame): DataFrame = {
    val (nodes, edges) = linkGraph(spark, docs)
    val r0 = nodes.select(col("node"), lit(Scale).as("r"))
    (1 to Iterations).foldLeft(r0)((r, _) => step(nodes, edges, r))
  }

  /** Oracle-side rendering of [[Iterations]] rounds — generated from the
    * same loop so the two engines can't drift. Expects CTEs `nodes`,
    * `edges`, `r0`; yields `r1..rIterations`. */
  private def stepsSql: String =
    (1 to Iterations).map { i =>
      s""",
        i$i AS (
          SELECT e.dst AS dst, sum(r.r // $OutDegree) AS inc
          FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1
        ),
        r$i AS (
          SELECT nodes.node,
                 ${Scale * 15 / 100} + (85 * coalesce(inc, 0)) // 100 AS r
          FROM nodes LEFT JOIN i$i ON nodes.node = i$i.dst
        )"""
    }.mkString

  def queries: Map[String, Q] = Map(
    // Full rank vector after the unrolled rounds: every node exercises
    // the join + partial-agg + teleport-floor path, and the hash compare
    // covers all n ranks bit-for-bit.
    "q153_pagerank" -> Q(
      (s, d) => pagerank(s, T.documents(s, d)),
      Some(s"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        nodes AS (
          SELECT DISTINCT doc_id % n AS node, n
          FROM documents CROSS JOIN nn
        ),
        edges AS (
          SELECT node AS src, (node * $A + j) % n AS dst
          FROM nodes CROSS JOIN
            (VALUES ${(0 until OutDegree).map(j => s"($j)").mkString(", ")})
            AS js(j)
        ),
        r0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM nodes)$stepsSql
        SELECT node, r FROM r$Iterations
      """.stripMargin),
      doc = "Damped PageRank over the derived link graph in exact integer " +
        "arithmetic: static edges, rank-only per-round shuffle, teleport " +
        "floor via left join; full rank vector oracled bit-for-bit")
  )
}
