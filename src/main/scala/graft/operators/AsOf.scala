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

  /** Interval (range) join, binned: each interval is exploded to the
    * fixed-width bins it covers, each point maps to its one bin, and the
    * match becomes an EQUI-join on the bin key plus a residual range
    * filter. Spark's native plan for `p BETWEEN s AND e` with no equality
    * key is a broadcast-nested-loop join — O(|points|·|intervals|) work
    * that no cluster survives at 100 TB. Binning makes it a shuffle
    * hash/sort-merge join whose cost is |points| + Σ(span/binWidth + 1)
    * interval replicas, with AQE splitting any hot bin.
    *
    * `binWidth` is the caller's span/selectivity dial: ~max interval span
    * keeps replication ≤ 2× while keeping bins selective. Semantics:
    * inner join on `start ≤ p < end` (end-exclusive, the time-window
    * convention).
    *
    * The two inputs must not share column names (the equi-join would
    * silently resolve ambiguously — alias one side first); an interval
    * spanning more than `maxBinsPerInterval` bins fails with a clear
    * message instead of exploding a near-2³¹-element sequence (or
    * quietly producing a billion replicas of one hot interval). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
                startCol: String, endCol: String,
                binWidth: Long,
                maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    require(maxBinsPerInterval > 0, s"maxBinsPerInterval=$maxBinsPerInterval")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin inputs share column names ${shared.mkString(", ")} — " +
        "alias one side before joining")
    // a bin key that cannot collide with either input's columns
    val bin = Iterator.from(0).map(i => s"__bin$i")
      .find(n => !points.columns.contains(n) && !intervals.columns.contains(n)).get
    // drop empty/inverted intervals BEFORE binning: they can match no
    // point (the residual filter is vacuously false), but sequence(a, b)
    // generates DESCENDING bins when a > b, so a malformed interval would
    // otherwise explode span/binWidth junk rows instead of zero
    val wellFormed = intervals.filter(col(endCol) > col(startCol))
    val loBin = floor(col(startCol) / binWidth).cast("long")
    // end-exclusive: an interval ending exactly on a bin edge does not
    // reach into the next bin
    val hiBin = floor((col(endCol) - 1) / binWidth).cast("long")
    val guardedHi = when(hiBin - loBin < maxBinsPerInterval, hiBin)
      .otherwise(raise_error(format_string(
        s"rangeJoin: interval [%s, %s) spans more than $maxBinsPerInterval " +
          s"bins at binWidth=$binWidth — widen binWidth or raise maxBinsPerInterval",
        col(startCol).cast("string"), col(endCol).cast("string"))))
    val binned = wellFormed.withColumn(bin, explode(sequence(loBin, guardedHi)))
    points.withColumn(bin, floor(col(ptCol) / binWidth).cast("long"))
      .join(binned, Seq(bin))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop(bin)
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
      doc = "as-of join composed from union+carry, vs DuckDB native ASOF"),

    // clicks landing inside each error's 5-minute incident window —
    // the interval-join shape (impact analysis, ad attribution,
    // maintenance-window filtering). µs domain for oracle parity; the
    // oracle states the plain BETWEEN semantics the binning must preserve.
    "q92_range_join" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d).withColumn("ts_us", expr("ts div 1000"))
        val windows = ev.filter($"event_type" === "error")
          .select($"event_id".as("win_id"), $"ts_us".as("wstart"),
            ($"ts_us" + 300000000L).as("wend"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"ts_us", $"value")
        rangeJoin(clicks, windows, "ts_us", "wstart", "wend",
          binWidth = 300000000L)
          .groupBy($"win_id")
          .agg(count(lit(1)).as("n_clicks"),
            // decimal-stable sum (Dashboard.dsum rationale): exact integer
            // accumulation → bit-identical under any partitioning, so the
            // driver's hash gate can't be flipped by float add order
            sum($"value".cast("decimal(28,4)")).cast("double")
              .as("click_value_r"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, epoch_us(ts) AS ts_us, event_type, "value"
          FROM events
        )
        SELECT w.event_id AS win_id, count(*) AS n_clicks,
               CAST(sum(CAST(c."value" AS DECIMAL(28,4))) AS DOUBLE)
                 AS click_value_r
        FROM ev w
        JOIN ev c ON c.ts_us >= w.ts_us AND c.ts_us < w.ts_us + 300000000
                 AND c.event_type = 'click'
        WHERE w.event_type = 'error'
        GROUP BY w.event_id
      """.stripMargin),
      doc = "binned interval join: equi-join on time bins + residual range filter")
  )
}
