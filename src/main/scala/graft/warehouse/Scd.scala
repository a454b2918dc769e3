package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Set-based slowly-changing-dimension engine — the Spark-native
  * re-expression of the reference's seven SSIS SCD packages (SURVEY.md
  * §2.5; canonical topology `project
  * SSIS!graduation_project/graduation_project/country_dimension.dtsx:2886-2936`).
  *
  * Column dispositions follow SSIS `ColumnType`: business key, historical
  * (SCD2: change ⇒ expire current row + insert new version), changing
  * (SCD1: change ⇒ in-place overwrite), fixed (carried, never compared).
  *
  * Deliberate divergences from the reference, per SURVEY §2.5 quirks
  * (declared, intended-semantics implementation):
  *  - within-batch duplicate BKs are deduplicated deterministically
  *    (SSIS row-at-a-time inserts duplicates);
  *  - `is_current` is maintained on expiry for every dim (the reference
  *    only does so for loan_type, `loan_type_dim.dtsx:445`);
  *  - per-row UPDATE side-channels (`country_dimension.dtsx:1427,1539`)
  *    become one shuffle-joined table rewrite.
  *
  * Scale: the merge is one full-outer shuffle join on the BK plus unions —
  * no per-row driver round-trips; SK assignment is the range-partitioned
  * [[SurrogateKeys.assign]]; history rows are carried through untouched
  * (union, no join).
  */
final case class ScdSpec(
    bk: String,
    scd2: Seq[String],
    scd1: Seq[String],
    fixed: Seq[String] = Nil,
    sk: String = "sk") {
  def attrCols: Seq[String] = scd2 ++ scd1 ++ fixed
  def allIn: Seq[String] = bk +: attrCols
}

object Scd {

  /** Deterministic within-batch dedup: first row per BK under ORDER BY all
    * attribute columns (stable regardless of input partitioning). Null-BK
    * rows are dropped here — a null key can never match the equality join
    * in [[merge]], so a surviving null-BK row would be re-inserted as
    * "new" on EVERY batch, breaking the ≤1-current-row-per-BK invariant.
    * Enforcing it inside the engine (not at each caller) makes the
    * invariant unconditional. */
  def dedup(batch: DataFrame, spec: ScdSpec): DataFrame = {
    val w = Window.partitionBy(col(spec.bk))
      .orderBy(spec.attrCols.map(col): _*)
    batch.filter(col(spec.bk).isNotNull)
      .select(spec.allIn.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Initial load: dedup + surrogate keys + SCD bookkeeping columns.
    * The deduped rows are persisted (scope-registered) before SK
    * assignment: [[SurrogateKeys.assign]] reads its input twice (range
    * sampling + the keyed pass), and dedup is a full-batch window — on a
    * data-scaled batch (q103: 600k rows per dim) recomputing it per read
    * doubled every dim build. */
  def initialLoad(batch: DataFrame, spec: ScdSpec, asOf: String,
                  scope: CacheScope = CacheScope.untracked): DataFrame =
    SurrogateKeys.assign(scope.persist(dedup(batch, spec)),
      Seq(spec.bk), spec.sk, scope = scope)
      .withColumn("source_system_code", lit(1))
      .withColumn("start_date", lit(asOf).cast("date"))
      .withColumn("end_date", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .select(((spec.sk +: spec.allIn) ++ Seq(
        "source_system_code", "start_date", "end_date", "is_current")).map(col): _*)

  private def anyDiffers(cols: Seq[String]): Column =
    cols.map(c => !(col(s"s.$c") <=> col(s"c.$c")))
      .foldLeft(lit(false))(_ || _)

  /** One SCD merge of `batch` into dimension `dim` as of `asOf`.
    *
    * Row routing (same outputs as the SSIS SCD component,
    * `country_dimension.dtsx:1646-1755`):
    *  - history rows (end_date set): carried unchanged;
    *  - current, BK absent from batch: carried unchanged;
    *  - current, present, no attr change: carried unchanged;
    *  - SCD1-only change: in-place patch of changing cols;
    *  - SCD2 change: current row expired (end_date=asOf, is_current=false)
    *    and a new version inserted;
    *  - new BK: inserted. New rows get SKs above the current max.
    *
    * Cache lifecycle: the merge persists two relations (the input dim and
    * the full-outer join) because each feeds multiple plan branches. They
    * are registered against `scope`; a caller running repeated merges (the
    * streaming/hourly warehouse loop) must pass an owned [[CacheScope]] and
    * release it once the merged output is materialized — otherwise storage
    * blocks accumulate batch-over-batch (see CacheScope scaladoc).
    */
  def merge(dim: DataFrame, batch: DataFrame, spec: ScdSpec, asOf: String,
            scope: CacheScope = CacheScope.untracked): DataFrame = {
    // side-presence markers: deriving presence from BK nullness would
    // mis-route null-BK rows (they fail the equality join, so a single
    // input row would satisfy BOTH isNew and isAbsent and emit twice)
    // dim feeds three readers (current-row filter, history filter, max-SK
    // aggregate): one cached evaluation instead of three runs of whatever
    // plan produced it (dimension-sized, so bounded at warehouse scale)
    val dimP = scope.persist(dim)
    val staged = dedup(batch, spec).withColumn("__s_present", lit(true)).as("s")
    val cur = dimP.filter(col("end_date").isNull)
      .withColumn("__c_present", lit(true)).as("c")
    val hist = dimP.filter(col("end_date").isNotNull)

    // MATERIALIZED: the join result feeds two readers (the fused
    // carry projection and the insert branch); one cached evaluation
    // instead of re-running the full-outer shuffle per branch. Dims are
    // dimension-sized, so the cache is bounded even at warehouse scale.
    val j = scope.persist(
      staged.join(cur, col(s"s.${spec.bk}") === col(s"c.${spec.bk}"), "full_outer"))
    val isNew = col("__c_present").isNull
    val isAbsent = col("__s_present").isNull
    val scd2Chg = anyDiffers(spec.scd2)
    val scd1Chg = anyDiffers(spec.scd1)

    val bookkeeping = Seq("source_system_code", "start_date", "end_date", "is_current")
    val outCols = (spec.sk +: spec.allIn) ++ bookkeeping

    // ONE pass routes every current-dim row: untouched (BK absent from
    // batch) and kept rows carry through, SCD1-only changes patch the
    // changing cols in place, SCD2 changes expire the row. The three
    // outcomes are mutually exclusive per row, so they fuse into a single
    // conditional projection — no per-branch re-traversal of the join.
    val scd2Expiring = !isAbsent && scd2Chg
    val scd1Patching = !isAbsent && !scd2Chg && scd1Chg
    val carried = j.filter(!isNew)
      .select((Seq(col(s"c.${spec.sk}"), col(s"c.${spec.bk}")) ++
        spec.scd2.map(c => col(s"c.$c")) ++
        spec.scd1.map(c => when(scd1Patching, col(s"s.$c")).otherwise(col(s"c.$c")).as(c)) ++
        spec.fixed.map(c => col(s"c.$c")) ++
        Seq(col("c.source_system_code"), col("c.start_date"),
          when(scd2Expiring, lit(asOf).cast("date")).otherwise(col("c.end_date")).as("end_date"),
          when(scd2Expiring, lit(false)).otherwise(col("c.is_current")).as("is_current"))): _*)
      .toDF(outCols: _*)

    // inserts: brand-new BKs + new versions of SCD2-changed BKs. The SK
    // offset (current max) joins in as a broadcast scalar — no driver
    // action inside the merge plan.
    // persisted: inserts are batch-change-sized (tiny against the dim) and
    // read twice by SK assignment; the persist also routes assignment onto
    // its single-partition fast path (no range sampling, no offsets
    // broadcast — see SurrogateKeys) whenever the change set counts small
    val inserts = scope.persist(j.filter(isNew || (!isAbsent && scd2Chg))
      .select(spec.allIn.map(c => col(s"s.$c")): _*))
    val maxSkDf = dimP.agg(coalesce(max(col(spec.sk)), lit(0L)).as("__max_sk"))
    val inserted = SurrogateKeys.assign(inserts, Seq(spec.bk), spec.sk, scope = scope)
      .crossJoin(broadcast(maxSkDf))
      .withColumn(spec.sk, col(spec.sk) + col("__max_sk"))
      .drop("__max_sk")
      .withColumn("source_system_code", lit(1))
      .withColumn("start_date", lit(asOf).cast("date"))
      .withColumn("end_date", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .select(outCols.map(col): _*)

    hist.select(outCols.map(col): _*)
      .unionByName(carried).unionByName(inserted)
  }
}
