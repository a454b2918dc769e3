package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, order-stable surrogate-key assignment — the set-based
  * replacement for the reference's database IDENTITY columns (SURVEY.md
  * §2.5: SSIS fast-load destinations generate SKs at the DB, e.g.
  * `project SSIS!...country_dimension.dtsx:483-504`).
  *
  * Semantics: `sk = offset + rank of row under ORDER BY keyCols` (dense,
  * 1-based) — identical to SQL `row_number() OVER (ORDER BY keys)`, which
  * keeps it oracle-checkable.
  *
  * Scale: a naive `row_number` over an un-partitioned window collapses to a
  * single task (the reference's own known hazard, SURVEY §2.7 W1). Instead
  * the key space is range-bucketed against DRIVER-PINNED bounds
  * ([[RangeBuckets]] — bucket id is a pure function of the key), rows take
  * `row_number` *within* each bucket, and per-bucket offsets come from a
  * narrow key-only count aggregate — every stage is fully parallel, nothing
  * needs materializing for determinism, and the only driver-sized data is
  * one row per bucket.
  */
object SurrogateKeys {

  def assign(df: DataFrame, keyCols: Seq[String], skName: String,
             offset: Long = 0L, numPartitions: Option[Int] = None,
             scope: CacheScope = CacheScope.untracked): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    // scale the range-partition count with the input (a fixed 32-way range
    // shuffle dominates wall-clock on small dims; at scale the input split
    // count grows with the data and so does this). A PERSISTED input that
    // counts small takes the single-partition fast path below — the count
    // only reads (or materializes, which a later reader needed anyway)
    // the cache; unpersisted inputs never pay an extra pass for it.
    val n = numPartitions.getOrElse {
      val persisted =
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (persisted && df.count() <= 100000) 1
      else math.max(df.rdd.getNumPartitions, 1)
    }
    if (n == 1) {
      // dictionary-bounded inputs (the warehouse dims): ONE narrow task
      // assigns the total-order SK directly — no range sampling, no
      // per-partition offsets aggregate, no broadcast join, no cache
      // write. Deterministic without materialization: pid is always 0
      // and row_number over the total key order has no execution-order
      // freedom. The non-foldable constant partition key keeps the
      // WindowExec partition spec non-empty (see the offsets note below).
      return df.repartitionByRange(1, keys: _*)
        .withColumn(skName, (row_number().over(
          Window.partitionBy(pmod(spark_partition_id(), lit(1)))
            .orderBy(keys: _*)) + lit(offset)).cast("long"))
    }
    val pid = "__sk_pid"
    val rn = "__sk_rn"
    // Bucket ids come from DRIVER-PINNED bounds (RangeBuckets): pid is a
    // pure function of the key, so the per-bucket counts — the global SK
    // offsets — reduce in a NARROW key-only aggregate straight off the
    // unmaterialized input, and task retries agree by construction (the
    // earlier sampled-`repartitionByRange` + `spark_partition_id()`
    // formulation had to persist the full ranged frame purely so two
    // evaluations would see the same execution-dependent pids).
    val (pidX, nBuckets) = RangeBuckets.pidExpr(df, keyCols, n)
    val withRn = df
      .withColumn(pid, pidX)
      .withColumn(rn, row_number().over(
        Window.partitionBy(col(pid)).orderBy(keys: _*)))
    // per-bucket sizes → cumulative offsets (one row per bucket; tiny;
    // the spine covers sample-empty buckets). The single-partition
    // window is INTENTIONAL on this driver-sized frame; the
    // constant-VALUED but non-foldable partition key (pmod of the pid —
    // a literal gets constant-folded out of the spec) silences Spark's
    // "No Partition Defined" warning so real single-partition
    // regressions stay visible.
    val counts = df.groupBy(pidX.as(pid)).agg(count(lit(1)).as("__sk_cnt"))
    val spine = df.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as(pid))
    val offsets = spine.join(counts, Seq(pid), "left")
      .withColumn("__sk_off",
        coalesce(sum(col("__sk_cnt")).over(
          Window.partitionBy(pmod(col(pid), lit(1))).orderBy(col(pid))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(pid), col("__sk_off"))
    withRn.join(broadcast(offsets), pid)
      .withColumn(skName, (col("__sk_off") + col(rn) + lit(offset)).cast("long"))
      .drop(pid, rn, "__sk_off")
  }
}
