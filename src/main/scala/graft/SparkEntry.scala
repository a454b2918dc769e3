package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator pack's catalog; each entry has a
  * matching DuckDB oracle in `oracleSql` when the semantics are
  * ANSI-SQL-expressible (the driver hash-compares at sf0.01).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    operators.Relational,
    operators.Exprs,
    operators.Warehouse,
    operators.Windows,
    operators.Dashboard,
    operators.Stats,
    operators.Streaming,
    operators.AsOf,
    operators.TextAnalysis,
    operators.Bpe,
    operators.Curation,
    operators.Dedup,
    operators.Crawl,
    operators.Similarity,
    operators.Multimodal,
    operators.Quality,
    operators.Graph,
    operators.LinkGraph,
    operators.NgramLm,
    operators.Classify,
    operators.ZOrder,
    operators.Ibrd
  )

  private lazy val catalog: Map[String, Q] = {
    val all = packs.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size, "duplicate query names")
    all.toMap
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog("q03_star_join").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (k, q) => k -> q.fn }

  /** Bench subset: the sf-scaled queries. The IBRD e2e entries below run
    * on a fixed 220-row fixture regardless of sfDir — constant-cost rows,
    * excluded so BENCH measures data-scaled throughput. The parity
    * pipeline IS benched at sf through q103_ibrd_scaled_build (IbrdScale:
    * ~600k staged rows at sf0.1). q122/q131 also replay against the
    * fixture star, but they ARE benched (VERDICT r11 §next-7): their cost
    * is the SERVING path — Layout compile + the 27-AST union plan — which
    * is plan-weight, not data-weight, and tracking it round-over-round is
    * the point. q130 is the crawl-loop INTEGRATION entry: it re-processes
    * the whole corpus through 4 quarter-batches end-to-end (~17 s at
    * sf0.1, ProfileQ130), and every steady-state step it composes is
    * already benched individually (q126 LSH step, q123 assignment, q127
    * maintenance, q100 knockout) — benching the full reprocess drive
    * would double-count those operators, so it is correctness-gated
    * (oracled final state + StreamingSpec) instead. q145 is the same
    * integration drive with media composed in (its steady-state media
    * step is benched as q144), excluded for the same reason, as is
    * q148 (the same 4-batch drive plus a manifest snapshot read), q179
    * (the same drive with the frontier member composed in — its
    * steady-state pieces are benched as q159 extraction, q163
    * canonicalization, q100's knockout shape, and q169's rollup) and
    * q188 (the same drive again, reading the fetch log it carried — its
    * steady-state pieces are the frontier member's plus the q182
    * scheduling step; the wave derivation itself is two map-side
    * filters). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries.removedAll(Seq("q70_ibrd_e2e_loans_by_status",
      "q71_ibrd_measures_card", "q72_ibrd_staged", "q73_ibrd_trend_by_year",
      "q74_ibrd_dim_country", "q75_ibrd_incremental_dim",
      "q76_ibrd_incremental_fact", "q130_crawl_pipeline",
      "q145_crawl_media_pipeline", "q148_crawl_time_travel",
      "q179_crawl_frontier", "q188_frontier_recrawl"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (k, Q(_, Some(sql), _)) => k -> sql.trim }
}
