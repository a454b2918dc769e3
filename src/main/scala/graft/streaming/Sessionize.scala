package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Gap-based sessionization — batch twin + Structured Streaming stateful
  * implementation.
  *
  * The reference's streaming surface is an hourly micro-batch with a
  * persistent cursor (SURVEY.md §2.9 R1, `pyspark_dag2.py:40-42,52-77`) —
  * no watermarks or session state. Sessionization is part of the
  * beyond-parity streaming surface (builder prompt): the same session
  * semantics implemented twice, so the streaming path can be
  * property-tested against the deterministic batch twin.
  *
  * Session rule: events of one user belong to one session while the gap
  * between consecutive events is ≤ `gapNs`. All arithmetic is on the raw
  * nanosecond epoch (LongType) — exact integers, oracle-safe.
  */
object Sessionize {

  /** Batch twin: lag → new-session flag → running session counter.
    * Two shuffles (both on user_id); at scale each user's history sorts
    * within its own partition — no global window. */
  def batch(events: DataFrame, gapNs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_ts").isNull || (col("ts") - col("prev_ts") > gapNs)).cast("int"))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start_ns"),
        max(col("ts")).as("session_end_ns"),
        sum(col("value")).as("session_value"))
      .withColumn("duration_ns", col("session_end_ns") - col("session_start_ns"))
  }

  case class Ev(user_id: Long, ts: Long, event_id: Long, value: Double)
  case class SessionState(seq: Long, lastTs: Long, start: Long, n: Long, value: Double)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
                        session_start_ns: Long, session_end_ns: Long,
                        session_value: Double, duration_ns: Long)

  /** Streaming path: flatMapGroupsWithState emits a session every time a
    * gap closes it. Used with ProcessingTime/AvailableNow triggers in
    * tests; state is one small record per active user. */
  def streaming(events: Dataset[Ev], gapNs: Long)
               (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // within one micro-batch, process this user's events in time order
          val sorted = evs.toSeq.sortBy(e => (e.ts, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            st match {
              case null =>
                st = SessionState(1L, e.ts, e.ts, 1L, e.value)
              case s if e.ts - s.lastTs > gapNs =>
                closed += SessionOut(user, s.seq, s.n, s.start, s.lastTs,
                  s.value, s.lastTs - s.start)
                st = SessionState(s.seq + 1, e.ts, e.ts, 1L, e.value)
              case s =>
                st = s.copy(lastTs = e.ts, n = s.n + 1, value = s.value + e.value)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }
}
