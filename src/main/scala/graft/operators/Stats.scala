package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._

/** Distribution statistics the reference's dashboard layer implies but
  * never computes set-based (Power BI visuals bin and rank client-side;
  * `Loans Dashboard.pbix!Report/Layout` histograms the loan amounts) —
  * here as single-shuffle grouped aggregates.
  *
  * Scale: both queries are one hash-aggregate over the scan — partial
  * (map-side) aggregation first, one shuffle on the group key. Exact
  * percentiles hold the per-group values (bounded: groups are the 3
  * return flags); for high-cardinality groups the approx_percentile
  * sketch is the documented swap-in.
  */
object Stats extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ---- exact per-group percentiles (linear interpolation) ----
    "q47_group_percentiles" -> Q(
      (s, d) => {
        import s.implicits._
        def p(q: Double, name: String) =
          round(percentile($"l_extendedprice", lit(q)), 2).as(name)
        T.lineitem(s, d).groupBy($"l_returnflag")
          .agg(p(0.25, "p25"), p(0.5, "p50"), p(0.75, "p75"), p(0.9, "p90"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
               round(quantile_cont(l_extendedprice, 0.50), 2) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 2) AS p75,
               round(quantile_cont(l_extendedprice, 0.90), 2) AS p90,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
      """.stripMargin),
      doc = "exact per-group percentiles (quantile_cont parity)"),

    // ---- fixed-width histogram binning ----
    "q48_price_histogram" -> Q(
      (s, d) => {
        import s.implicits._
        T.orders(s, d)
          .groupBy(floor($"o_totalprice" / 50000).cast("int").as("bin"))
          .agg(count(lit(1)).as("n_orders"),
            sum($"o_totalprice".cast("decimal(28,2)")).cast("double")
              .as("bin_total"))
      },
      Some("""
        SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bin,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS bin_total
        FROM orders
        GROUP BY bin
      """.stripMargin),
      doc = "fixed-width price histogram (bin = 50k), decimal-stable totals")
  )
}
