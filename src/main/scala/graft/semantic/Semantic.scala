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

final class SemanticModel(fact: DataFrame, rels: Seq[Relationship],
                          measures: Map[String, Column]) {

  /** fact joined through its relationships (the Vertipaq "expanded table"). */
  lazy val expanded: DataFrame = rels.foldLeft(fact) { (acc, r) =>
    val d = if (r.broadcastDim) broadcast(r.dim) else r.dim
    acc.join(d, acc(r.factKey) === d(r.dimKey), "inner")
  }

  def measure(name: String): Column =
    measures.getOrElse(name, sys.error(s"unknown measure '$name'"))

  /** Compile one dashboard visual to a DataFrame (SURVEY §3.3). */
  def visual(v: Visual): DataFrame = {
    val filtered = v.filters.foldLeft(expanded)(_.filter(_))
    val aggs = v.measures.map(m => measure(m).as(m))
    val grouped =
      if (v.groupBy.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
      else filtered.groupBy(v.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (v.orderBy.isEmpty) grouped else grouped.orderBy(v.orderBy: _*)
  }
}
