package graft.operators

import graft.sources.PagedSource
import graft.streaming.Sessionize
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._

/** Streaming / incremental surface as batch-checkable queries (SURVEY.md
  * §2.9): windowed aggregation (the Structured Streaming groupBy-window
  * shape run on the same data as a batch), gap sessionization's batch twin,
  * and the paged-cursor micro-batch ingest. The true streaming runs
  * (readStream, watermark, flatMapGroupsWithState) are exercised in
  * StreamingSpec against these same semantics.
  *
  * `ts` is read as raw nanosecond LongType (nanosAsLong); bucket math is
  * integer division — exact on both engines.
  */
object Streaming extends QueryPack {

  val HourNs: Long = 3600L * 1000 * 1000 * 1000
  val GapNs: Long = 30L * 60 * 1000 * 1000 * 1000 // 30-minute session gap

  def queries: Map[String, Q] = Map(
    // ---- tumbling-window aggregation (streaming groupBy(window(...)) twin) ----
    "q40_tumbling_window" -> Q(
      (s, d) => {
        import s.implicits._
        // exact integer bucket math: ts - (ts mod hour) — no double division
        // (ts ~1.7e18 exceeds double's 53-bit mantissa)
        T.events(s, d)
          .withColumn("hour_bucket", ($"ts" - pmod($"ts", lit(HourNs))).cast("long"))
          .groupBy($"hour_bucket", $"event_type")
          .agg(count(lit(1)).as("n"), sum($"value").as("total_value"))
      },
      Some(s"""
        SELECT (epoch_ns(ts) // ${HourNs}) * ${HourNs} AS hour_bucket,
               event_type, count(*) AS n, sum("value") AS total_value
        FROM events
        GROUP BY hour_bucket, event_type
      """.stripMargin),
      doc = "tumbling 1h window agg, streaming twin (SURVEY §2.9)"),

    // ---- sliding-window aggregation (window(ts, size, slide) twin) ----
    // 1 h windows sliding every 30 min: with size = 2·slide every event
    // lands in exactly two windows — the slide-aligned bucket and the one
    // before it. Same exact integer bucket math as q40 (no double
    // division at 1.7e18 ns); the 2× row expansion happens map-side
    // (explode) and feeds the same partial-agg shuffle, which is how
    // Spark's streaming `window(size, slide)` physically executes too.
    "q88_sliding_window" -> Q(
      (s, d) => {
        import s.implicits._
        val slide = HourNs / 2
        val aligned = $"ts" - pmod($"ts", lit(slide))
        T.events(s, d)
          .select($"event_type", $"value",
            explode(array(aligned.cast("long"),
              (aligned - slide).cast("long"))).as("win_start"))
          .groupBy($"win_start", $"event_type")
          .agg(count(lit(1)).as("n"), sum($"value").as("total_value"))
      },
      Some(s"""
        WITH e AS (
          SELECT event_type, "value",
                 unnest([(epoch_ns(ts) // ${HourNs / 2}) * ${HourNs / 2},
                         (epoch_ns(ts) // ${HourNs / 2}) * ${HourNs / 2}
                           - ${HourNs / 2}]) AS win_start
          FROM events
        )
        SELECT win_start, event_type, count(*) AS n,
               sum("value") AS total_value
        FROM e GROUP BY win_start, event_type
      """.stripMargin),
      doc = "sliding 1h/30min window agg, streaming twin (SURVEY §2.9)"),

    // ---- gap-based sessionization (batch twin of the stateful stream) ----
    // The oracle runs in the MICROSECOND domain: DuckDB truncates
    // TIMESTAMP_NS parquet to µs on read, so ns-exact outputs can never
    // hash-match (caught by a sub-ms session at sf0.1). Both engines
    // sessionize the identical µs integers → exact parity.
    "q41_sessionize" -> Q(
      (s, d) => {
        val evUs = T.events(s, d)
          .withColumn("ts", expr("ts div 1000")) // exact integer ns→µs
        Sessionize.batch(evUs, GapNs / 1000)
          .withColumnRenamed("session_start_ns", "session_start_us")
          .withColumnRenamed("session_end_ns", "session_end_us")
          .withColumnRenamed("duration_ns", "duration_us")
      },
      Some(s"""
        WITH flagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id, "value",
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapNs / 1000}
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), numbered AS (
          SELECT user_id, ts_us, "value",
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
               sum("value") AS session_value,
               max(ts_us) - min(ts_us) AS duration_us
        FROM numbered
        GROUP BY user_id, session_seq
      """.stripMargin),
      doc = "gap sessionization batch twin, µs domain (streaming surface)"),

    // ---- semi-structured payload extraction (JSON props column) ----
    "q43_json_props" -> Q(
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("int"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"k").cast("long").as("sum_k"),
            max($"k").as("max_k"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events
        GROUP BY event_type
      """.stripMargin),
      doc = "JSON column extraction + agg (semi-structured ingest shape)"),

    // ---- changelog (CDC) compaction: latest state per key ----
    // The incremental-load primitive upstream of MERGE (q113 consumes a
    // compacted batch): a change stream keyed by user with
    // insert/update/delete ops collapses to current state. Implemented as
    // ONE hash aggregate — max_by(row, event_id) — not a window:
    // map-side partial aggregation compacts each input split down to one
    // row per key BEFORE the exchange, so at 100 TB the shuffle carries
    // ~|keys| rows, while the row_number()-window formulation would
    // shuffle + sort the whole changelog (the oracle uses the window form
    // precisely because it is implementation-independent). Keys whose
    // latest op is a tombstone disappear from the compacted state.
    // event_id is unique (asserted in StreamingSpec), so max_by is
    // deterministic.
    "q114_cdc_compact" -> Q(
      (s, d) => {
        import s.implicits._
        val log = T.events(s, d).select(
          $"user_id", $"event_id",
          when($"event_type" === "signup", "I")
            .when($"event_type" === "error", "D")
            .otherwise("U").as("op"),
          $"value")
        log.groupBy($"user_id")
          .agg(
            max($"event_id").as("last_event_id"),
            max_by($"op", $"event_id").as("last_op"),
            max_by($"value", $"event_id").as("last_value"),
            count(lit(1)).as("n_changes"))
          .filter($"last_op" =!= "D")
      },
      Some("""
        WITH log AS (
          SELECT user_id, event_id,
                 CASE WHEN event_type = 'signup' THEN 'I'
                      WHEN event_type = 'error'  THEN 'D'
                      ELSE 'U' END AS op,
                 "value"
          FROM events
        ), latest AS (
          SELECT user_id, event_id AS last_event_id, op AS last_op,
                 "value" AS last_value,
                 count(*) OVER (PARTITION BY user_id) AS n_changes,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM log
        )
        SELECT user_id, last_event_id, last_op, last_value, n_changes
        FROM latest WHERE rn = 1 AND last_op <> 'D'
      """.stripMargin),
      doc = "changelog compaction to current state: hash-agg max_by, tombstone drop (CDC / incremental load)"),

    // ---- streaming dedup (batch twin) ----
    // the dedup family's streaming leg: first occurrence per content key
    // in event-time order. The true streaming run (watermark +
    // dropDuplicatesWithinWatermark over a MemoryStream) is asserted
    // equivalent in StreamingSpec; here the batch twin is hash-verified.
    // µs domain for oracle parity (DuckDB truncates ns parquet).
    "q44_stream_dedup" -> Q(
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"event_type", $"value")
          .orderBy($"ts_us", $"event_id")
        T.events(s, d)
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("__rn", row_number().over(w))
          .filter($"__rn" === 1)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_unique"),
            min($"event_id").as("min_id"),
            sum($"value").as("total_value"))
      },
      Some("""
        WITH firsts AS (
          SELECT event_id, user_id, event_type, "value" FROM (
            SELECT *, row_number() OVER (
              PARTITION BY user_id, event_type, "value"
              ORDER BY epoch_us(ts), event_id) AS rn
            FROM events) WHERE rn = 1
        )
        SELECT event_type, count(*) AS n_unique,
               min(event_id) AS min_id, sum("value") AS total_value
        FROM firsts
        GROUP BY event_type
      """.stripMargin),
      doc = "streaming dedup batch twin: first occurrence per content key"),

    // ---- paged-cursor micro-batch ingest (50k-page REST shape) ----
    "q42_paged_ingest" -> Q(
      (s, d) => {
        import s.implicits._
        PagedSource.ingestPages(T.events(s, d), "event_id",
          pageSize = 100L, nPages = 3)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), min($"event_id").as("min_id"),
            max($"event_id").as("max_id"))
      },
      Some("""
        SELECT event_type, count(*) AS n, min(event_id) AS min_id,
               max(event_id) AS max_id
        FROM events
        WHERE event_id >= 0 AND event_id < 300
        GROUP BY event_type
      """.stripMargin),
      doc = "cursor-paged micro-batch union (SURVEY §2.1 S1, §2.9 R1)")
  )
}
