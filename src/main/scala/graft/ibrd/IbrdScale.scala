package graft.ibrd

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** sf-SCALED IBRD-shaped raw batch (SURVEY.md §7 — the one gap VERDICT r8
  * flagged: the flagship parity pipeline ran only on the 220-row fixture
  * and was never performance-graded).
  *
  * Every row is a deterministic function of a dense-ish index
  * `i = l_orderkey·8 + l_linenumber` over the sf `lineitem` table
  * (~600k rows at sf0.1, ~60k at sf0.01), reusing [[Fixture]]'s value
  * cycles — same dictionaries, same null patterns (sparse
  * `project_name_`, null borrowers/guarantors), same raw-cased strings —
  * so the REAL pipeline ([[Clean.stage]] → [[IbrdWarehouse.build]] →
  * [[IbrdMeasures]]) gets data-scaled work while a DuckDB oracle can
  * recompute the measure result directly from the index arithmetic.
  *
  * Deliberate data features, each exercising a pipeline stage:
  *  - `i % 16 ∈ {14, 15}` rows carry non-fiscal snapshots → P1 filter;
  *  - `l_linenumber = 7` aliases to 1, so 7-line orders contribute an
  *    IDENTICAL duplicate row → the fact's (loan_number, end_of_period)
  *    within-batch dedup has real work (identical dups, so the keep-first
  *    tie-break cannot diverge between engines);
  *  - `i % 97 = 0` rows get country "Atlantis" (absent from country_BK)
  *    → null BK → dropped by the non-dangling fact filter;
  *  - borrower null at `i % 7 = 0` (canonical-borrower overwrite + the
  *    `not_specified` sentinel), guarantor null at `i % 11 = 0`;
  *  - `j = i + i/3` de-correlates the status/type cycle from the
  *    snapshot cycle, as in [[Fixture]].
  *
  * Measure-bearing numerics are integer-valued doubles ≤ 2·10⁶ so every
  * partial sum is an exact integer far below 2⁵³ — bit-identical under
  * any partitioning, in both engines (the float-hash-gate rule).
  */
object IbrdScale {

  private val snapshots16: Seq[String] =
    Model.keptSnapshots ++ Seq("31-Dec-2020", "30-Sep-2019")
  private val countriesRaw = Vector(
    "Turkiye", "Viet Nam", "INDIA", "Israel", "Albania", "Czechia",
    "North Macedonia", "Brazil", "Japan", "uzbakistan")
  private val regionsRaw = Vector(
    "Africa East", "South Asia", "EUROPE AND CENTRAL ASIA",
    "Latin America and Caribbean", "Middle East and North Africa",
    "Western and Central Africa")
  private val statusesRaw = Vector(
    "Repaid", "Cancelled", "Disbursed", "Effective", "Signed", "Disbursing")
  /** statusesRaw after lower + Status_Cleaning recode, in cycle order —
    * the oracle indexes this list directly with j % 6. */
  val statusesClean: Seq[String] = Vector(
    "fully repaid", "fully cancelled", "fully disbursed",
    "effective", "signed", "disbursing")
  private val typesRaw = Vector(
    "SCP EUR", "NPL", "FSL", "Pool Loan", "SCP USD", "CPL")
  private val borrowersRaw = Vector("Borrower Alpha", "Borrower Beta", "Borrower Gamma")
  private val months5 = Vector("Jan", "Mar", "Jun", "Sep", "Nov")

  private def pick(vals: Seq[String], idx: Column): Column =
    element_at(array(vals.map(lit): _*), (idx + 1).cast("int"))

  /** Raw 33-column API page under [[Model.rawSchema]], one row per
    * lineitem row, all values index-derived (no randomness). */
  def rawScaled(s: SparkSession, dir: String): DataFrame = {
    val iExpr = (col("l_orderkey") * 8 +
      when(col("l_linenumber") === 7, 1).otherwise(col("l_linenumber")))
      .cast("long")
    val base = Tables.lineitem(s, dir).select(iExpr.as("i"))
    val i = col("i")
    val j = i + floor(i / 3).cast("long")
    val cidx = i % 10
    val mmm = pick(months5, i % 5)
    base.select(
      pick(snapshots16, i % 16).as("end_of_period"),
      concat(lit("LN"), i.cast("string")).as("loan_number"),
      pick(regionsRaw, cidx % 6).as("region"),
      concat(lit("C"), cidx.cast("string")).as("country_code"),
      when(i % 97 === 0, lit("Atlantis"))
        .otherwise(pick(countriesRaw, cidx)).as("country"),
      when(i % 7 === 0, lit(null).cast("string"))
        .otherwise(pick(borrowersRaw, j % 3)).as("borrower"),
      concat(lit("G"), (i % 4).cast("string")).as("guarantor_country_code"),
      when(i % 11 === 0, lit(null).cast("string"))
        .otherwise(pick(countriesRaw, (i + 3) % 10)).as("guarantor"),
      pick(typesRaw, (j + 1) % 6).as("loan_type"),
      pick(statusesRaw, j % 6).as("loan_status"),
      lit("USD").as("currency_of_commitment"),
      concat(lit("P"), (i % 1000).cast("string")).as("project_id"),
      when(i % 5 === 0, concat(lit("Project "), (i % 1000).cast("string")))
        .otherwise(lit(null).cast("string")).as("project_name_"),
      lit("01-Jan-2000").as("agreement_signing_date"),
      lit("01-Feb-2000").as("effective_date_most_recent"),
      lit("01-Mar-2000").as("last_disbursement_date"),
      // concat, not format_string: java.util.Formatter is interpreted
      // per call and measured as a visible slice of the 600k-row
      // generation; concat/lpad stay inside codegen. Output identical.
      concat(lit("15-"), mmm, lit("-"), (i % 20 + 1995).cast("string"))
        .as("first_repayment_date"),
      concat(lit("15-"), mmm, lit("-"), (i % 15 + 2010).cast("string"))
        .as("last_repayment_date"),
      concat(lpad((i % 9 + 1).cast("string"), 2, "0"), lit("-"), mmm,
        lit("-"), (i % 30 + 1990).cast("string")).as("board_approval_date"),
      lit("31-Dec-2024").as("closed_date_most_recent"),
      (lit(0.5) + (i % 80).cast("double") * 0.1).as("interest_rate"),
      (lit(1.0e6) + (i % 100000).cast("double") * 10.0)
        .as("original_principal_amount"),
      ((i % 10).cast("double") * 500.0).as("cancelled_amount"),
      ((i % 7).cast("double") * 300.0).as("undisbursed_amount"),
      (lit(9.0e5) + (i % 90000).cast("double") * 9.0).as("disbursed_amount"),
      ((i % 13).cast("double") * 100.0).as("repaid_to_ibrd"),
      ((i % 17).cast("double") * 50.0).as("due_to_ibrd"),
      lit(0.0).as("exchange_adjustment"),
      (lit(5.0e5) + (i % 50000).cast("double")).as("borrowers_obligation"),
      lit(0.0).as("sold_3rd_party"),
      ((i % 3).cast("double") * 25.0).as("repaid_3rd_party"),
      ((i % 5).cast("double") * 12.0).as("due_3rd_party"),
      lit(1.0e5).as("loans_held"))
  }

  /** The full scaled parity run: clean → 7 SCD dims + DimDate + fact.
    * Built FRESH on every call (no memo) — q103 exists to TIME this
    * pipeline at sf; the star's internal dim caches are per-call and
    * unreferenced after the returned visual materializes (ContextCleaner
    * reclaims them post-GC, which Bench forces between reps).
    * Uses the KEYED stage (Clean.stageKeyed): one bounds sample buckets
    * both the fill window and the fact dedup/SK window, and the landing
    * itself carries the partitioning — the fact path adds zero
    * exchanges after the checkpoint (VERDICT r9 §next-6). */
  def star(s: SparkSession, dir: String): IbrdWarehouse.Star = {
    val (staged, pidName, nBuckets) = Clean.stageKeyed(rawScaled(s, dir))
    IbrdWarehouse.build(s, staged, factPid = Some((pidName, nBuckets)))
  }
}
