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

  /** [[build]] with the fail-on-no-match probe FUSED into the lookup
    * pass (VERDICT r9 §next-6): each lookup joins LEFT and keeps its key
    * alias as a per-row guard, and one non-prunable `assert_true` filter
    * raises — naming the offending dim key(s) — the moment any row
    * misses a lookup. Same output as `assertNoDangling` + [[build]]
    * (inner ≡ left when nothing dangles) in ONE pass over the fact: the
    * probe's separate materialization disappears. The failure fires at
    * the fact's first ACTION instead of declaration time — same batch,
    * same message, one fewer full pass.
    *
    * Spark-4.x dependency (advisor r10): correctness here requires the
    * optimizer's `EliminateOuterJoin` to NOT treat the `assert_true`
    * filter as null-filtering on the lookup aliases — if it did, the
    * LEFT joins would convert to INNER and dangling rows would be
    * DROPPED before the assert ever fired. On 4.1.2 this holds because
    * `canFilterOutNull` eval-probes the predicate with a null row and
    * its NonFatal catch bails on the throwing assert (it cannot prove
    * null-filtering, so the join stays LeftOuter). WarehouseSpec pins
    * the optimized-plan shape ("buildChecked keeps its joins
    * LeftOuter…"), so a Spark upgrade that changes the rule's behavior
    * fails the suite instead of silently dropping rows. */
  def buildChecked(fact: DataFrame, lookups: Seq[Lookup]): DataFrame = {
    def keyAlias(i: Int) = s"__lk${i}_${lookups(i).dimKey}"
    val joined = lookups.zipWithIndex.foldLeft(fact) { case (acc, (lk, i)) =>
      val dimPrepped = lk.dim
        .dropDuplicates(lk.dimKey)
        .select(col(lk.dimKey).as(keyAlias(i)) +:
          lk.retrieve.map { case (c, alias) => col(c).as(alias) }: _*)
      val dimSide = if (lk.broadcastDim) broadcast(dimPrepped) else dimPrepped
      acc.join(dimSide, lk.factKey === col(keyAlias(i)), "left")
    }
    val allMatched = lookups.indices
      .map(i => col(keyAlias(i)).isNotNull).reduce(_ && _)
    val culprits = concat_ws(", ", lookups.indices.map(i =>
      when(col(keyAlias(i)).isNull, lit(lookups(i).dimKey))): _*)
    joined
      // assert_true is NULL when the guard holds (filter keeps the row)
      // and THROWS otherwise; a filter cannot be column-pruned away
      .filter(assert_true(allMatched,
        concat(lit("dangling fact keys against dim key(s) "), culprits,
          lit(" (NoMatchBehavior=0)"))).isNull)
      .drop(lookups.indices.map(keyAlias): _*)
  }

  /** Referential-integrity probe: raises if any fact row has no match in a
    * lookup (the moral equivalent of the reference's fail-on-no-match).
    * ONE pass over the fact: every lookup's key set joins in as a
    * broadcast left join (the same join shapes [[build]] uses, fused into
    * one WholeStageCodegen span) and a single aggregate reports which
    * lookups left any row unmatched. The previous union-of-left_anti
    * formulation was also one job but scanned the fact once PER lookup —
    * ten full passes that dominated the scaled warehouse build (q103). A
    * null fact key never matches, so it is flagged dangling — identical
    * to the left_anti semantics. */
  def assertNoDangling(fact: DataFrame, lookups: Seq[Lookup]): Unit = {
    def keyAlias(i: Int) = s"__probe${i}_${lookups(i).dimKey}"
    val marked = lookups.zipWithIndex.foldLeft(fact) { case (acc, (lk, i)) =>
      acc.join(
        broadcast(lk.dim.select(col(lk.dimKey).as(keyAlias(i)))
          .dropDuplicates(keyAlias(i))),
        lk.factKey === col(keyAlias(i)), "left")
    }
    val aggs = lookups.indices.map(i =>
      max(when(col(keyAlias(i)).isNull, lit(lookups(i).dimKey))).as(s"__d$i"))
    val row = marked.agg(aggs.head, aggs.drop(1): _*).collect()(0)
    val dangling = lookups.indices.flatMap(i => Option(row.getString(i)))
    require(dangling.isEmpty,
      s"dangling fact keys against dim key(s) ${dangling.mkString(", ")} (NoMatchBehavior=0)")
  }
}
