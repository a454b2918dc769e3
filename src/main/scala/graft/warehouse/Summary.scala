package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Incremental materialized-aggregate maintenance — keep a grouped
  * (count, sum) summary current under a keyed change batch WITHOUT
  * rescanning the base table (classic incremental view maintenance for
  * the distributive aggregates).
  *
  * Shapes: `summarize` builds the summary (one scan, decimal-exact
  * sums); `maintain` applies a MERGE-style batch (update / delete /
  * insert, the [[Merge.upsert]] contract) as DELTA rows: each matched
  * batch row retracts its BEFORE-image (one batch-keyed join against
  * the base — the only base access, proportional to the batch), each
  * non-delete row asserts its after-image, and the summary absorbs the
  * deltas in one tiny aggregate. Group MIGRATION (an update moving a
  * row between groups) is handled naturally: retraction in the old
  * group, assertion in the new.
  *
  * Correctness is EXACT, not approximate: measures fold through
  * DECIMAL, and the summary schema CARRIES the exact decimal
  * accumulator (`__t`) alongside the display double (`total`) — each
  * maintain cycle folds deltas into `__t`, never into the double, so
  * delta-then-sum equals recompute-from-scratch bit-for-bit under any
  * partitioning AND any number of maintain cycles. (Re-deriving the
  * accumulator from the double would silently lose cents once a
  * group's |total| passes ~2^52/100 ≈ 4.5e13 — exactly the regime a
  * 100 TB summary table lives in.) At 100 TB the win is the whole
  * point of summary tables: the base is never rescanned; cost is one
  * batch-sized join + a |groups|-sized aggregate.
  */
object Summary {

  /** (group, n, __t, total) summary of `base`; `measure` folds through
    * DECIMAL(28,2) (exact for 2-dp money at any partitioning). `__t`
    * is the exact decimal accumulator [[maintain]] folds into; `total`
    * is its DOUBLE display projection. */
  def summarize(base: DataFrame, group: Column, measure: Column): DataFrame =
    base.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(measure.cast("decimal(28,2)")).as("__t"))
      .select(col("grp"), col("n"), col("__t"),
        col("__t").cast("double").as("total"))

  /** Apply `batch` (carrying `key`, the group/measure columns, and an
    * op consumed by `deleteWhen`) to `summary` over base table `base`.
    * Batch contract = [[Merge.upsert]]'s: at most one row per key;
    * deletes/updates match existing keys, inserts don't. */
  def maintain(summary: DataFrame, base: DataFrame, batch: DataFrame,
               key: String, group: Column, measure: Column,
               deleteWhen: Column): DataFrame = {
    // before-images: ONE batch-keyed join against the base — deletes and
    // updates retract what the base currently holds for their key
    val before = batch.select(col(key))
      .join(base.select(col(key), group.as("grp"),
        measure.cast("decimal(28,2)").as("m")), key)
      .select(col("grp"), lit(-1L).as("dn"), (-col("m")).as("dm"))
    // after-images: every surviving (non-delete) batch row asserts its
    // new group/measure — updates thereby migrate groups for free
    val after = batch.filter(!coalesce(deleteWhen, lit(false)))
      .select(group.as("grp"), lit(1L).as("dn"),
        measure.cast("decimal(28,2)").as("dm"))
    summary
      // fold into the EXACT accumulator, never the display double
      .select(col("grp"), col("n").as("dn"), col("__t").as("dm"))
      .unionByName(before).unionByName(after)
      .groupBy(col("grp"))
      .agg(sum(col("dn")).as("n"),
        sum(col("dm")).cast("decimal(38,2)").as("__t"))
      .filter(col("n") > 0)
      .select(col("grp"), col("n"), col("__t"),
        col("__t").cast("double").as("total"))
  }
}
