package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Fact-table assembly: the Spark re-expression of the reference's
  * 10-lookup chain (SURVEY.md §2.4 J1/J2; `project
  * SSIS!...loan_fact.dtsx:60-1710`, topology `:2635-2693`).
  *
  * Each SSIS full-cache Lookup (build side fully in memory, 25 MB cap)
  * becomes a broadcast hash join; Catalyst/AQE pipelines the whole chain
  * inside one WholeStageCodegen span — no per-lookup materialization.
  *
  * Lookup semantics preserved:
  *  - `TreatDuplicateKeysAsError=false` → first-match-wins: the dim side
  *    is deduplicated on the key before joining;
  *  - `NoMatchBehavior=0` (fail pipeline on dangling key) →
  *    [[assertNoDangling]], a left_anti probe that raises instead of
  *    silently dropping rows.
  */
object FactBuilder {

  final case class Lookup(
      dim: DataFrame,
      factKey: Column,
      dimKey: String,
      retrieve: Seq[(String, String)], // (dim col, fact alias)
      broadcastDim: Boolean = true)

  /** Left-side fact stream joined through the lookup chain (inner joins,
    * reference `NoMatchBehavior=0`). Call [[assertNoDangling]] first when
    * the fail-on-no-match contract must hold.
    *
    * The dim key is aliased to a unique temp name before the join so the
    * fact may carry an identically-named column (the common case: joining
    * a dim on the very BK column the fact holds). */
  def build(fact: DataFrame, lookups: Seq[Lookup]): DataFrame =
    lookups.zipWithIndex.foldLeft(fact) { case (acc, (lk, i)) =>
      val keyAlias = s"__lk${i}_${lk.dimKey}"
      val dimPrepped = lk.dim
        .dropDuplicates(lk.dimKey)
        .select(col(lk.dimKey).as(keyAlias) +:
          lk.retrieve.map { case (c, alias) => col(c).as(alias) }: _*)
      val dimSide = if (lk.broadcastDim) broadcast(dimPrepped) else dimPrepped
      acc.join(dimSide, lk.factKey === col(keyAlias), "inner").drop(keyAlias)
    }

  /** Referential-integrity probe: raises if any fact row has no match in a
    * lookup (the moral equivalent of the reference's fail-on-no-match).
    * All lookups are checked in ONE Spark job (a union of per-lookup
    * left_anti counts), not one job per lookup. */
  def assertNoDangling(fact: DataFrame, lookups: Seq[Lookup]): Unit = {
    val probes = lookups.zipWithIndex.map { case (lk, i) =>
      val keyAlias = s"__probe${i}_${lk.dimKey}"
      fact
        .join(lk.dim.select(col(lk.dimKey).as(keyAlias)).dropDuplicates(keyAlias),
          lk.factKey === col(keyAlias), "left_anti")
        .select(lit(lk.dimKey).as("dim_key"))
        .limit(1)
    }
    val dangling = probes.reduce(_ unionAll _).collect().map(_.getString(0))
    require(dangling.isEmpty,
      s"dangling fact keys against dim key(s) ${dangling.mkString(", ")} (NoMatchBehavior=0)")
  }
}
