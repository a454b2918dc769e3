package graft.semantic

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Thin semantic layer — the Spark re-expression of the reference's
  * Power BI model (SURVEY.md §3.3): dims + fact registered as relations,
  * measures as named Column expressions, and each dashboard visual compiled
  * to `fact ⋈ dims → filter → groupBy → agg → orderBy`.
  *
  * Reference: `Loans Dashboard.pbix!Report/Layout` `prototypeQuery` blocks —
  * e.g. clusteredColumnChart `From[_Measures, Dimension_LoanStatus]
  * Select[Loans, loan_status] OrderBy[Loans desc]` — and the `_Measures`
  * table's 10 DAX measures (SURVEY §2.6 A2–A7).
  *
  * Field parameters (the BI model's `PrmStatus&Type`,
  * `PrmAmount&Repiad&Due`, `PrmDorrower&Guarantor` tables, SURVEY
  * §1.3/§3.3): a visual references a parameter as `"@name"` in its
  * `measures` or `groupBy`; the user's slicer selection substitutes one of
  * the parameter's options BEFORE compilation, so Catalyst only ever sees
  * the resolved plan — parameter switching costs nothing at runtime.
  *
  * The date hierarchy (BI model `DimDate` drill) compiles the same way:
  * [[SemanticModel.drill]] expands the first `depth` hierarchy levels into
  * group-by columns, so Year → Quarter → Month drill paths are ordinary
  * grouped aggregations over the expanded star.
  *
  * Catalyst sees one declarative plan per visual: filters push through the
  * joins into the scans, dims broadcast, aggregation is partial+final. At
  * 100 TB a visual query shuffles once (the final group-by), never the fact.
  */
final case class Relationship(dim: DataFrame, factKey: String, dimKey: String,
                              broadcastDim: Boolean = true)

final case class Visual(
    measures: Seq[String],
    groupBy: Seq[String],
    filters: Seq[Column] = Nil,
    orderBy: Seq[Column] = Nil)

/** A field-parameter slicer: the selected option (a measure name or a
  * column name, depending on where the parameter is referenced) replaces
  * the `"@name"` reference in the visual. Unselected → first option. */
final case class FieldParameter(options: Seq[String]) {
  require(options.nonEmpty, "field parameter needs at least one option")
  def default: String = options.head
}

final class SemanticModel(fact: DataFrame, rels: Seq[Relationship],
                          measures: Map[String, Column],
                          parameters: Map[String, FieldParameter] = Map.empty,
                          hierarchy: Seq[(String, Column)] = Nil,
                          pageFilters: Seq[Column] = Nil) {

  /** fact joined through its relationships (the Vertipaq "expanded
    * table"), with any page-level cross-filters applied once. */
  lazy val expanded: DataFrame = pageFilters.foldLeft(
    rels.foldLeft(fact) { (acc, r) =>
      val d = if (r.broadcastDim) broadcast(r.dim) else r.dim
      acc.join(d, acc(r.factKey) === d(r.dimKey), "inner")
    })(_.filter(_))

  /** Page-level cross-filter (the Power BI interaction contract: a
    * slicer SELECTION filters every other visual on its page): a model
    * whose expanded table is pre-filtered ONCE, so every visual
    * compiled from it sees the selection. Catalyst pushes the filter
    * through the dim joins into the scans, exactly as if each visual
    * had declared it — [[graft.semantic.Layout.replayPage]] and
    * SemanticLayoutSpec assert that equivalence. */
  def crossFiltered(selection: Column*): SemanticModel =
    new SemanticModel(fact, rels, measures, parameters, hierarchy,
      pageFilters ++ selection)

  /** The model plus extra relationship hops — snowflake paths a
    * cross-filter needs that no visual groups by (e.g. region two joins
    * from the fact). Hops join in declaration order, so a later hop may
    * key on a column a former hop retrieved. */
  def withRelationships(extra: Relationship*): SemanticModel =
    new SemanticModel(fact, rels ++ extra, measures, parameters,
      hierarchy, pageFilters)

  def measure(name: String): Column =
    measures.getOrElse(name, sys.error(s"unknown measure '$name'"))

  /** The declared field parameter — a parameter SLICER enumerates these
    * options as its rows (the Layout replay's Prm* visuals). */
  def parameter(name: String): FieldParameter =
    parameters.getOrElse(name, sys.error(s"unknown field parameter '$name'"))

  /** `"@name"` → the selected (or default) option; anything else passes
    * through. Selections outside the parameter's options are rejected —
    * a slicer can only choose what the parameter table declares. */
  private def resolve(name: String, selections: Map[String, String]): String =
    if (!name.startsWith("@")) name
    else {
      val pname = name.drop(1)
      val p = parameters.getOrElse(pname,
        sys.error(s"unknown field parameter '$pname'"))
      val chosen = selections.getOrElse(pname, p.default)
      require(p.options.contains(chosen),
        s"'$chosen' is not an option of field parameter '$pname' (${p.options.mkString(", ")})")
      chosen
    }

  /** Compile one dashboard visual to a DataFrame (SURVEY §3.3), with
    * field-parameter selections applied first. */
  def visual(v: Visual, selections: Map[String, String] = Map.empty): DataFrame = {
    val filtered = v.filters.foldLeft(expanded)(_.filter(_))
    val aggs = v.measures.map(resolve(_, selections))
      .map(m => measure(m).as(m))
    val gb = v.groupBy.map(resolve(_, selections))
    val grouped =
      if (gb.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
      else filtered.groupBy(gb.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (v.orderBy.isEmpty) grouped else grouped.orderBy(v.orderBy: _*)
  }

  /** Drill the date hierarchy to `depth` levels: the visual's measures
    * grouped by hierarchy levels 1..depth (plus any explicit groupBy),
    * ordered by the levels — the Year/Quarter/Month drill of a trend
    * visual. */
  def drill(v: Visual, depth: Int,
            selections: Map[String, String] = Map.empty): DataFrame = {
    require(depth >= 1 && depth <= hierarchy.size,
      s"drill depth $depth outside hierarchy (${hierarchy.size} levels)")
    val levels = hierarchy.take(depth)
    val withLevels = levels.foldLeft(
      v.filters.foldLeft(expanded)(_.filter(_))) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    val aggs = v.measures.map(resolve(_, selections)).map(m => measure(m).as(m))
    val gb = levels.map(_._1) ++ v.groupBy.map(resolve(_, selections))
    withLevels.groupBy(gb.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(gb.map(col(_).asc): _*)
  }
}
