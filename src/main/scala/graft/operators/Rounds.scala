package graft.operators

import org.apache.spark.sql.DataFrame

/** Checkpoint strategy for iterative DataFrame algorithms (connected-
  * components contraction, Lloyd codebook training): per-round state must
  * be materialized with its lineage truncated, or the composed plan grows
  * until analysis dominates. Two durability tiers:
  *
  *  - default (`checkpointDir = None`): `localCheckpoint` — blocks live on
  *    executor storage. Fast, and right for local[*]; on a cluster an
  *    executor loss deletes round state mid-job and the job dies.
  *  - `checkpointDir = Some(dir)`: reliable `checkpoint()` — round state
  *    is written to fault-tolerant storage (HDFS/object store) and task
  *    retries re-read it after any executor loss. The per-round tables are
  *    tiny (contracted edges / a 16-row codebook), so the durability costs
  *    one small write per round.
  */
private[operators] final case class Rounds(checkpointDir: Option[String]) {

  /** Call once before iterating: registers the reliable dir when set.
    * NOTE: `setCheckpointDir` is SparkContext-global — concurrent
    * iterative operators in one session should share a single
    * checkpointDir (each RDD's files still land under distinct
    * generated subdirs), because the last `init` wins for all of them. */
  def init(df: DataFrame): Unit =
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)

  /** Materialize one round's state with truncated lineage. */
  def mark(df: DataFrame): DataFrame =
    if (checkpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
