package graft.ibrd

import graft.semantic.{Relationship, SemanticModel, Visual}
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
        Relationship(star.dimDate.select(col("DateSK"), col("year").as("period_year")),
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
        "Borrowers" -> countDistinct(col("FK_borrower"))))

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
