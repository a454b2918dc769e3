package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Globally-ordered forward fill without a single-partition window.
  *
  * The reference runs `last(col, ignorenulls) OVER (ORDER BY loan_number)`
  * unpartitioned — Spark warns and collapses to ONE task
  * (`pyspark_dag2.py:371-379`, warning in `spark_airflow.ipynb cell 8`;
  * SURVEY.md §2.7 W1, §7 risk 2). Scale fix (two-pass):
  *
  *  1. range-repartition by the order key → partitions are globally ordered
  *     ranges; fill within each partition (parallel windows);
  *  2. take each partition's last non-null (one row per partition, tiny),
  *     compute the running carry-in per partition on that driver-sized
  *     frame, broadcast-join it back, and coalesce.
  *
  * Equivalent to the global window for a total order key; at 100 TB it is
  * two parallel passes + one broadcast instead of one task sorting
  * everything.
  */
object Ffill {

  def forwardFill(df: DataFrame, orderCols: Seq[String], target: String,
                  numPartitions: Option[Int] = None,
                  scope: CacheScope = CacheScope.untracked): DataFrame = {
    val keys = orderCols.map(col)
    // partition count tracks the input size (see SurrogateKeys.assign)
    val n = numPartitions.getOrElse(math.max(df.rdd.getNumPartitions, 1))
    val ranged = df.repartitionByRange(n, keys: _*)
    val pid = "__ff_pid"
    val local = "__ff_local"
    // MATERIALIZED before use: read by both the carries aggregate and the
    // final join; range-bound sampling + spark_partition_id() are
    // execution-dependent, so independent evaluations could disagree on
    // pid assignment (see SurrogateKeys.assign)
    val withLocal = scope.persist(ranged
      .withColumn(pid, spark_partition_id())
      .withColumn(local, last(col(target), ignoreNulls = true).over(
        Window.partitionBy(col(pid)).orderBy(keys: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    // per-partition last filled value (max_by is order-insensitive under
    // the shuffle, unlike last()) → running carry from earlier partitions.
    // Single-partition window on a one-row-per-partition frame is
    // intentional; the constant-VALUED but non-foldable partition key
    // (pmod of the pid) silences the WindowExec warning — a literal gets
    // constant-folded out of the partition spec and the warning returns.
    val carries = withLocal.groupBy(col(pid))
      .agg(max_by(col(local), struct(keys: _*)).as("__ff_part_last"))
      .withColumn("__ff_carry", last(col("__ff_part_last"), ignoreNulls = true)
        .over(Window.partitionBy(pmod(col(pid), lit(1))).orderBy(col(pid))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(pid), col("__ff_carry"))
    withLocal.join(broadcast(carries), pid)
      .withColumn(target, coalesce(col(local), col("__ff_carry")))
      .drop(pid, local, "__ff_carry")
  }
}
