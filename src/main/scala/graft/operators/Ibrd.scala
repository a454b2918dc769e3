package graft.operators

import graft.ibrd.{Clean, Fixture, IbrdMeasures, IbrdWarehouse}
import graft.{Q, QueryPack}

/** End-to-end IBRD pipeline entries: fixture page → clean → star build →
  * dashboard visuals, all inside one Spark application (the reference's
  * three layers, SURVEY.md §0). No DuckDB oracle — the inputs are the
  * in-code fixture, not the sf tables; IbrdSpec pins golden counts
  * instead (rows-only check here).
  */
object Ibrd extends QueryPack {

  def queries: Map[String, Q] = Map(
    "q70_ibrd_e2e_loans_by_status" -> Q(
      (s, _) => IbrdMeasures.loansByStatus(star(s)),
      None,
      doc = "IBRD fixture → clean → 7 SCD dims + DimDate + fact → visual"),

    "q71_ibrd_measures_card" -> Q(
      (s, _) => IbrdMeasures.card(star(s)),
      None,
      doc = "all ten dashboard measures over the IBRD star")
  )

  // staged batch is read 8× by the star build (7 dims + fact): cache it
  private def star(s: org.apache.spark.sql.SparkSession): IbrdWarehouse.Star = {
    val staged = Clean.stage(Fixture.raw(s)).cache()
    IbrdWarehouse.build(s, staged)
  }
}
