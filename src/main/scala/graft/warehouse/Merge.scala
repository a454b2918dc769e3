package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Generic MERGE INTO (upsert) engine — the warehouse primitive the
  * reference approximates with per-row UPDATE side-channels
  * (`pyspark_dag2.py` SCD update loop; SURVEY §2.1 S9) and that every
  * lakehouse exposes as `MERGE INTO target USING source ON key`.
  *
  * Semantics (Delta/ANSI MERGE subset, set-based):
  *   - matched + `deleteWhen`   → row removed
  *   - matched otherwise        → row replaced by the source version
  *   - source-only + `deleteWhen` → no-op (delete of an absent key)
  *   - source-only otherwise    → row inserted
  *   - target-only              → row kept unchanged
  *
  * Execution shape: ONE full-outer shuffle join on the key and a single
  * routing projection — no per-row updates, no driver loop, no second
  * pass. At 100 TB both sides hash-partition on the key (the source is a
  * change batch and may itself be huge, so no broadcast is assumed; AQE
  * still downgrades to broadcast when the batch is small, and its skew
  * handling splits hot keys). The routing runs inside whole-stage codegen:
  * cost is the join exchange and nothing else.
  *
  * Contract: `source` carries every `target` column (same names/types; it
  * may carry EXTRA columns, e.g. an op flag consumed by `deleteWhen`) and
  * at most one row per key — MERGE on an ambiguous source is
  * non-deterministic in every engine, so callers compact the batch first
  * (see [[graft.operators.Streaming]] q114: changelog compaction is
  * exactly that operator).
  */
object Merge {

  /** Apply change batch `source` to `target` keyed by `key`.
    * `deleteWhen` is evaluated against the source row (default: never).
    * Result has exactly the target schema.
    */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      key: String,
      deleteWhen: Column = lit(false)): DataFrame = {
    val tCols = target.columns.toSeq
    require(tCols.contains(key), s"key $key not in target")
    val missing = tCols.filterNot(source.columns.contains)
    require(missing.isEmpty, s"source lacks target columns: $missing")

    // a source-side presence flag instead of key-null probes: a
    // legitimately-null key column can't be confused with "no match"
    // (full-outer pads with nulls). Only the SOURCE side needs a flag —
    // routing keeps the target row exactly when no source row matched,
    // which `__s_present IS NULL` already encodes.
    val srcRouted = source
      .withColumn("__del", coalesce(deleteWhen, lit(false)))
      .select(tCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("__del"), lit(true).as("__s_present")): _*)

    target.join(srcRouted, target(key) === srcRouted(s"__s_$key"), "full_outer")
      // drop every delete-flagged source row (matched → removes the target
      // row, unmatched → no-op: either way nothing survives routing)
      .filter(!coalesce(col("__del"), lit(false)))
      .select(tCols.map { c =>
        when(col("__s_present").isNotNull, col(s"__s_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
  }
}
