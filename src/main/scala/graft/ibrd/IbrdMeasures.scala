package graft.ibrd

import graft.semantic.{FieldParameter, Relationship, SemanticModel, Visual}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The ten dashboard measures over the IBRD star (SURVEY.md §2.6 A2–A7,
  * FIXTURES.md §6) and the Layout's visual queries, compiled through the
  * semantic layer.
  *
  * `interest_income`'s DAX body is unrecoverable from the reference
  * (XPress9-compressed Vertipaq); the Σ(disbursed × rate/100) definition is
  * inferred from the measure name and pinned here (SURVEY §7 risk 4).
  */
object IbrdMeasures {

  def model(star: IbrdWarehouse.Star): SemanticModel =
    new SemanticModel(
      star.fact,
      Seq(
        Relationship(star.dimStatus.filter(col("is_current")), "FK_loan_status", "PK_loan_status_SK"),
        Relationship(star.dimType.filter(col("is_current")), "FK_loan_type", "PK_loan_type_SK"),
        Relationship(star.dimBorrower.filter(col("is_current")), "FK_borrower", "PK_borrower_SK"),
        Relationship(star.dimGuarantor.filter(col("is_current")), "FK_guarantor", "PK_guarantor_SK"),
        Relationship(star.dimDate.select(col("DateSK"),
          col("Date").as("period_date"), col("year").as("period_year")),
          "End_period", "DateSK")),
      Map(
        "Loans" -> count(lit(1)),
        "Loan Amount" -> sum(col("original_principal_amount").cast("double")),
        "Repaid" -> sum(col("repaid")),
        "Due1" -> sum(col("due")),
        "Disbursed Amount" -> sum(col("disbursed_amount")),
        "Undisbursed Amount" -> sum(col("undisbursed_amount")),
        "Average Inerest Rate" -> avg(col("interest_rate")), // sic, reference name
        "Interest Income" -> sum(col("disbursed_amount") * col("interest_rate") / 100.0),
        "Guarantors" -> countDistinct(col("FK_guarantor")),
        "Borrowers" -> countDistinct(col("FK_borrower"))),
      parameters = parameters)

  /** [[model]] plus the country→region snowflake hops: `region` lives
    * two joins from the fact (fact.FK_country → Dimension_Country →
    * Dimension_Region, `country_dimension.dtsx:1264-1287`), and no
    * visual GROUPS by it — only the page-level region slicer filters
    * through it — so the base model omits the hops and the cross-filter
    * path (q131) adds them. Both dims join current rows on unique SKs:
    * no fact row is dropped or duplicated, so every measure of every
    * visual is unchanged when unfiltered. */
  def geoModel(star: IbrdWarehouse.Star): SemanticModel =
    model(star).withRelationships(
      Relationship(star.dimCountry.filter(col("is_current"))
        .select(col("PK_country_SK"), col("PK_region_SK").as("__geo_region_SK"),
          col("country")),
        "FK_country", "PK_country_SK"),
      Relationship(star.dimRegion.filter(col("is_current"))
        .select(col("PK_region_SK").as("__geo_region_SK_r"), col("region")),
        "__geo_region_SK", "__geo_region_SK_r"))

  /** The BI model's 3 field-parameter tables (SURVEY §1.3/§3.3). The
    * tables themselves live in the unrecoverable Vertipaq blob; the
    * option lists are reconstructed from the Layout's slicer-selection
    * filters, which reference `'_Measures'[Repaid]`,
    * `'_Measures'[Loan Amount]`, `'Dimension_Borrower'[borrower_name]`,
    * `'Dimension_Guarantor'[guarantor]`, `'Dimension_LoanStatus'
    * [loan_status]` (`Loans Dashboard.pbix!Report/Layout`). Options are
    * OUR model's field names (the reference's `borrower_name` is this
    * star's `borrower` column) so a selection resolves to a real field. */
  val parameters: Map[String, FieldParameter] = Map(
    "PrmStatus&Type" -> FieldParameter(Seq("loan_status", "loan_type")),
    "PrmAmount&Repiad&Due" ->
      FieldParameter(Seq("Loan Amount", "Repaid", "Due1")),
    "PrmDorrower&Guarantor" ->
      FieldParameter(Seq("borrower", "guarantor")))

  /** Option list of one parameter, star-free (oracle generation). */
  def parameterOptions(name: String): Seq[String] = parameters(name).options

  /** The Layout's flagship clusteredColumnChart: Loans by loan_status,
    * ordered by measure desc (SURVEY §3.3). */
  def loansByStatus(star: IbrdWarehouse.Star): DataFrame =
    model(star).visual(Visual(
      measures = Seq("Loans", "Loan Amount"),
      groupBy = Seq("loan_status"),
      orderBy = Seq(col("Loans").desc, col("loan_status").asc)))

  /** Line chart: Loan Amount by End_period year asc, with a year IN filter. */
  def amountByYear(star: IbrdWarehouse.Star, years: Seq[Int]): DataFrame =
    model(star).visual(Visual(
      measures = Seq("Loan Amount", "Loans", "Borrowers"),
      groupBy = Seq("period_year"),
      filters = Seq(col("period_year").isin(years: _*)),
      orderBy = Seq(col("period_year").asc)))

  /** Card: all ten measures at once. */
  def card(star: IbrdWarehouse.Star): DataFrame =
    model(star).visual(Visual(
      measures = Seq("Loans", "Loan Amount", "Repaid", "Due1",
        "Disbursed Amount", "Undisbursed Amount", "Average Inerest Rate",
        "Interest Income", "Guarantors", "Borrowers"),
      groupBy = Nil))
}
