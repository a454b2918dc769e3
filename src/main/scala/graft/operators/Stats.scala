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

  /** µs per week (cohort bucketing). */
  val WeekUs: Long = 7L * 86400 * 1000 * 1000

  def queries: Map[String, Q] = Map(
    // ---- ordered-funnel analysis (signup → click → purchase) ----
    // The event-sequence staple: how many users performed stage k only
    // counting occurrences AFTER their stage-(k−1) event. Strict order
    // is enforced with running flags over ONE partitioned window pass
    // (seen_signup, then click-qualified-by-signup, then
    // purchase-qualified-by-that-click) — never a per-stage self-join
    // (k-stage funnels as joins are k−1 shuffles of the event table) and
    // never a per-user collect_list (unbounded state per key). At 100 TB:
    // one shuffle on user_id, streaming window evaluation, two partial
    // aggregates down to a single row. event_id is the order key
    // (unique, time-correlated — the q26 reasoning).
    "q120_funnel" -> Q(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val staged = T.events(s, d)
          .select($"user_id", $"event_id", $"event_type")
          .withColumn("seen_signup",
            max(when($"event_type" === "signup", 1).otherwise(0)).over(w))
          .withColumn("q_click",
            when($"event_type" === "click" && $"seen_signup" === 1, 1)
              .otherwise(0))
          .withColumn("seen_qclick", max($"q_click").over(w))
          .withColumn("conv",
            when($"event_type" === "purchase" && $"seen_qclick" === 1, 1)
              .otherwise(0))
        staged.groupBy($"user_id")
          .agg(max($"seen_signup").as("s1"), max($"q_click").as("s2"),
            max($"conv").as("s3"))
          .agg(sum($"s1").cast("long").as("n_signup"),
            sum($"s2").cast("long").as("n_click_after_signup"),
            sum($"s3").cast("long").as("n_purchase_after_click"))
      },
      Some("""
        WITH staged AS (
          SELECT user_id, event_id, event_type,
                 max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   OVER w AS seen_signup
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), staged2 AS (
          SELECT *,
                 CASE WHEN event_type = 'click' AND seen_signup = 1
                      THEN 1 ELSE 0 END AS q_click,
                 max(CASE WHEN event_type = 'click' AND seen_signup = 1
                          THEN 1 ELSE 0 END) OVER w AS seen_qclick
          FROM staged
          WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), per_user AS (
          SELECT user_id, max(seen_signup) AS s1, max(q_click) AS s2,
                 max(CASE WHEN event_type = 'purchase' AND seen_qclick = 1
                          THEN 1 ELSE 0 END) AS s3
          FROM staged2 GROUP BY user_id
        )
        SELECT CAST(sum(s1) AS BIGINT) AS n_signup,
               CAST(sum(s2) AS BIGINT) AS n_click_after_signup,
               CAST(sum(s3) AS BIGINT) AS n_purchase_after_click
        FROM per_user
      """.stripMargin),
      doc = "strict-order 3-stage funnel via running window flags (one window pass, no per-stage self-joins)"),

    // ---- cohort retention grid ----
    // Users bucketed by first-activity week; the (cohort, week-offset)
    // grid counts distinct active users. Two user-keyed hash aggregates
    // + one shuffle join on user_id (cohort table is |users|-sized — no
    // broadcast assumed; AQE may choose one) + the grid aggregate whose
    // output is |cohorts × offsets| — tiny. µs domain. NOTE: Spark `div`
    // truncates toward zero while DuckDB `//` floors, so the week
    // buckets agree ONLY because event timestamps are positive-epoch
    // (1970+, guaranteed by the generator) — a pre-1970 corpus would
    // need an explicit floor on the Spark side.
    "q121_cohort_retention" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
          .select($"user_id", expr(s"(ts div 1000) div $WeekUs").as("week"))
        val cohort = ev.groupBy($"user_id").agg(min($"week").as("cohort_week"))
        ev.join(cohort, "user_id")
          .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
          .agg(countDistinct($"user_id").as("n_users"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // $WeekUs AS week FROM events
        ), cohort AS (
          SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        )
        SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM ev e JOIN cohort c USING (user_id)
        GROUP BY 1, 2
      """.stripMargin),
      doc = "cohort retention grid: first-activity-week cohorts x week offset, distinct active users"),

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
