package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Globally-ordered forward fill without a single-partition window.
  *
  * The reference runs `last(col, ignorenulls) OVER (ORDER BY loan_number)`
  * unpartitioned — Spark warns and collapses to ONE task
  * (`pyspark_dag2.py:371-379`, warning in `spark_airflow.ipynb cell 8`;
  * SURVEY.md §2.7 W1, §7 risk 2). Scale fix (pinned-bounds two-pass):
  *
  *  1. sample the ORDER KEYS once and pin n−1 range bounds as plan
  *     literals — the partition id becomes a PURE FUNCTION of the key
  *     (a fold of tuple comparisons against the pinned bounds), so every
  *     evaluation — and every task retry — agrees on it with nothing
  *     materialized;
  *  2. fill within each pid bucket (parallel windows, one hash exchange);
  *  3. per-bucket last non-null values reduce in a COLUMN-PRUNED narrow
  *     aggregate straight off the input (no persist — pid is
  *     deterministic), the running carry-in per bucket is computed on
  *     that driver-sized frame and broadcast-joined back.
  *
  * Equivalent to the global window for a total order key. Versus the
  * earlier sampled-`repartitionByRange` + persist formulation this drops
  * the full-width materialization and one full-width read: the only
  * full-width pass left is the fill window itself; bounds sampling and
  * the carries aggregate are pruned to the key/target columns. Bucket
  * balance depends on the sample like any range exchange; a skewed
  * sample degrades parallelism, never correctness (equal keys can never
  * straddle a strict `>` bound).
  */
object Ffill {

  /** `pidSpec`: an externally-pinned (bucket expression, bucket count)
    * replacing the internal bounds sample — MUST range-bucket a PREFIX of
    * `orderCols`' total order (equal prefix values colocated, bucket ids
    * ascending with the order), which keeps both the within-bucket fill
    * and the cross-bucket carry exact. Lets one sample drive SEVERAL
    * exchanges over the same key domain (the q103 landing shares its
    * bucket id between this fill and the fact dedup/SK window).
    * `keepPidAs`: retain the bucket id under that name in the output (so
    * a downstream window can reuse the exchange's partitioning) instead
    * of dropping it. */
  def forwardFill(df: DataFrame, orderCols: Seq[String], target: String,
                  numPartitions: Option[Int] = None,
                  scope: CacheScope = CacheScope.untracked,
                  pidSpec: Option[(Column, Int)] = None,
                  keepPidAs: Option[String] = None): DataFrame = {
    val keys = orderCols.map(col)
    val n = numPartitions.getOrElse(math.max(df.rdd.getNumPartitions, 1))
    val (pid, nBuckets) = pidSpec.getOrElse(RangeBuckets.pidExpr(df, orderCols, n))
    val local = "__ff_local"
    val filled = df
      .withColumn("__ff_pid", pid)
      .withColumn(local, last(col(target), ignoreNulls = true).over(
        Window.partitionBy(col("__ff_pid")).orderBy(keys: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-bucket last non-null target (max_by over the non-null rows —
    // order-insensitive, column-pruned, and pid is deterministic so this
    // independent evaluation CANNOT disagree with the fill pass), spread
    // over the FULL bucket spine (a bucket whose every target is null
    // still inherits earlier buckets' carry) → running carry from
    // earlier buckets. The single-partition window is intentional on
    // this one-row-per-bucket frame; the constant-VALUED but
    // non-foldable partition key silences the WindowExec warning.
    val present = df
      .filter(col(target).isNotNull)
      .groupBy(pid.as("__ff_pid"))
      .agg(max_by(col(target), struct(keys: _*)).as("__ff_part_last"))
    val spine = df.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("__ff_pid"))
    val carries = spine.join(present, Seq("__ff_pid"), "left")
      .withColumn("__ff_carry", last(col("__ff_part_last"), ignoreNulls = true)
        .over(Window.partitionBy(pmod(col("__ff_pid"), lit(1)))
          .orderBy(col("__ff_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__ff_pid"), col("__ff_carry"))
    val out = filled.join(broadcast(carries), Seq("__ff_pid"), "left")
      .withColumn(target, coalesce(col(local), col("__ff_carry")))
      .drop(local, "__ff_carry")
    keepPidAs match {
      case Some(name) => out.withColumnRenamed("__ff_pid", name)
      case None => out.drop("__ff_pid")
    }
  }
}
