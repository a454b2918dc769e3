package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions: forward fill (the reference's only window op) plus
  * ranking/running/lag analytics.
  *
  * Reference coverage (SURVEY.md §2.7): W1 forward fill — the reference
  * runs `last(..., ignorenulls) OVER (ORDER BY loan_number)` with NO
  * partitioning, collapsing to a single task (`pyspark_dag2.py:371-379`,
  * runtime warning captured in `spark_airflow.ipynb cell 8`). Here every
  * window is partitioned (user_id / customer), so at 100 TB each key's
  * history sorts inside its own shuffle partition — no global sort, no
  * single-task stage.
  *
  * Ordering is on `event_id` (unique, time-correlated) rather than the raw
  * nanosecond `ts` to keep ordering identical across engines (Spark
  * truncates parquet ns→µs).
  */
object Windows extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ---- W1: partitioned forward fill of sparse values ----
    "q25_forward_fill" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d).select(
          $"event_id", $"user_id", $"event_type",
          last(when($"event_type" === "click", $"value"), ignoreNulls = true)
            .over(w).as("last_click_value"))
      },
      Some("""
        SELECT event_id, user_id, event_type,
               last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_value
        FROM events
      """.stripMargin),
      doc = "forward fill, partitioned (SURVEY §2.7 W1 + scale fix §7)"),

    // ---- trailing time-RANGE frame per key (feature engineering) ----
    // "events and value volume in the hour BEFORE each event, per user" —
    // the rolling-feature op (fraud velocity counts, rate limits,
    // trailing engagement). A RANGE frame on the µs timestamp, not a ROWS
    // frame: the window widens and narrows with event density, which is
    // the semantics feature stores actually need. Partitioned by user —
    // each key's history sorts inside its own shuffle partition (the
    // usual W1 scale argument); frame evaluation is streaming two-pointer
    // work per partition, no re-scan per row. The value sum runs through
    // DECIMAL: sliding-frame double sums are computed subtract-on-evict
    // by one engine and segment-tree by the other — exact integer
    // accumulation is the only bit-stable contract. µs domain (ts div
    // 1000) because DuckDB truncates ns parquet to µs.
    "q118_trailing_range" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts_us")
          .rangeBetween(-3600L * 1000 * 1000, Window.currentRow)
        T.events(s, d)
          .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"),
            $"value")
          .select($"event_id", $"user_id", $"ts_us",
            count(lit(1)).over(w).as("trail_1h_n"),
            sum($"value".cast("decimal(28,10)")).over(w).cast("double")
              .as("trail_1h_value"))
      },
      Some("""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               count(*) OVER w AS trail_1h_n,
               CAST(sum(CAST("value" AS DECIMAL(28,10))) OVER w AS DOUBLE)
                 AS trail_1h_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      """.stripMargin),
      doc = "trailing 1h RANGE-frame count/sum per key (rolling feature op; density-adaptive frame)"),

    // ---- W2: ranking + running aggregate ----
    "q26_running_rank" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        T.orders(s, d).select(
          $"o_orderkey", $"o_custkey",
          row_number().over(w).as("order_seq"),
          sum($"o_totalprice")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_spend"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER w AS INT) AS order_seq,
               sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      """.stripMargin),
      doc = "row_number + running sum per key (SURVEY §2.7 W2)"),

    // ---- W2: lag delta ----
    "q27_lag_delta" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        T.events(s, d).select(
          $"event_id", $"user_id",
          ($"value" - lag($"value", 1).over(w)).as("value_delta"))
      },
      Some("""
        SELECT event_id, user_id,
               value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id)
                 AS value_delta
        FROM events
      """.stripMargin),
      doc = "lag-based delta per key (SURVEY §2.7 W2)")
  )
}
