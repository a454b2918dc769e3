package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of join — the canonical "operator Spark lacks" (builder prompt's
  * escalation example). Composed from built-ins per the preference order
  * (a): union both sides, tag, and carry the latest right-side value
  * forward within each key's time-ordered stream — one shuffle on the
  * key, each key sorts inside its partition, no custom SparkPlan needed.
  *
  * Semantics: for each left row, the right row of the same key with the
  * greatest `ts ≤ left.ts` (right rows at the exact same timestamp DO
  * match — the union orders right before left on ties). Right side is
  * pre-deduplicated per (key, ts) so tie choice is deterministic.
  */
object AsOf extends QueryPack {

  /** leftCols/rightCols are projected through; right side contributes
    * `valueCol` carried as-of. Both sides need `keyCol` and `tsCol`. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val rightTagged = right
      .select(col(keyCol), col(tsCol), col(valueCol))
      // deterministic tie choice: one right row per (key, ts)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as("__v"))
      .withColumn("__side", lit(0))
    val unioned = leftTagged.select(
      (left.columns.toIndexedSeq.map(col) ++ Seq(col("__side"), col("__v"))): _*)
      .unionByName(rightTagged
        .select(col(keyCol), col(tsCol), col("__side"), col("__v")),
        allowMissingColumns = true)
    // right rows (side 0) sort before left rows (side 1) at equal ts,
    // so a same-instant right value is visible to the left row
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry a non-null STRUCT per right row (not the raw value): with the
    // raw value, last(ignoreNulls) would skip a matched right row whose
    // value is NULL and resurrect an older non-null one — diverging from
    // ASOF semantics whenever valueCol is nullable. The struct is non-null
    // exactly when a right row exists, so the true as-of match wins even
    // when its value is null.
    val marker = when(col("__side") === 0, struct(col("__v").as("v")))
    unioned
      .withColumn("__m", marker)
      .withColumn(s"asof_$valueCol",
        last(col("__m"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .drop("__side", "__v", "__m")
  }

  def queries: Map[String, Q] = Map(
    // for each purchase, the latest click value of the same user at or
    // before the purchase instant (µs domain for oracle parity)
    "q28_asof_join" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d).withColumn("ts_us", expr("ts div 1000"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts_us")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts_us", $"value")
        asOfJoin(purchases, clicks, "user_id", "ts_us", "value")
          .select($"event_id", $"user_id", $"asof_value")
      },
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, "value"
          FROM events
        ), purchases AS (
          SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, ts_us, max("value") AS v
          FROM ev WHERE event_type = 'click'
          GROUP BY user_id, ts_us
        )
        SELECT p.event_id, p.user_id, c.v AS asof_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
      """.stripMargin),
      doc = "as-of join composed from union+carry, vs DuckDB native ASOF")
  )
}
