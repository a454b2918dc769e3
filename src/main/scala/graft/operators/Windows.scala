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
