package graft.ibrd

import graft.operators.Exprs
import graft.warehouse.Ffill
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The IBRD cleaning pipeline (SURVEY.md §2.2/§2.3/§2.7, lifecycle §3.1)
  * as one composable Catalyst plan — the reference's five
  * XCom-serialized Airflow tasks (`pyspark_dag2.py:79-388`) collapse into
  * a single lazy DataFrame program with no driver round-trips.
  *
  * Stage order preserves the reference semantics: snapshot filter (raw
  * case) → early drops → lower-all-strings → dictionary recodes →
  * canonical-borrower overwrite → sentinel fill → BK encoding (unmatched →
  * null) → forward fill → derived measures → late drops.
  */
object Clean {

  import Fixture._

  /** P1: keep the 14 fiscal-year-end snapshots (`pyspark_dag2.py:120-126`). */
  def snapshotFilter(df: DataFrame): DataFrame =
    df.filter(col("end_of_period").isin(Model.keptSnapshots: _*))

  /** E2: exact-match dictionary recodes (`pyspark_dag2.py:304-305`). */
  def recodes(df: DataFrame): DataFrame = df
    .withColumn("loan_status", Exprs.recode(col("loan_status"), statusCleaning, keepUnmatched = true))
    .withColumn("loan_type", Exprs.recode(col("loan_type"), typeCleaning, keepUnmatched = true))
    .withColumn("country", Exprs.recode(col("country"), countriesCleaning, keepUnmatched = true))
    .withColumn("guarantor", Exprs.recode(col("guarantor"), countriesCleaning, keepUnmatched = true))
    .withColumn("region", Exprs.recode(col("region"), regionsCleaning, keepUnmatched = true))

  /** E3: canonical borrower per country — one map coalesce instead of the
    * reference's 52-deep when/otherwise chain (`pyspark_dag2.py:307-311`). */
  def borrowerOverwrite(df: DataFrame): DataFrame =
    df.withColumn("borrower",
      coalesce(element_at(typedLit(borrowerCleaning), col("country")), col("borrower")))

  /** E5: integer business keys; unmatched keys stay null
    * (`pyspark_dag2.py:355-369`). */
  def encodeBks(df: DataFrame): DataFrame = df
    .withColumn("region_BK", element_at(typedLit(regionsBk), col("region")))
    .withColumn("country_BK", element_at(typedLit(countryBk), col("country")))
    .withColumn("guarantor_BK", element_at(typedLit(countryBk), col("guarantor")))
    .withColumn("borrower_BK", element_at(typedLit(borrowerBk), col("borrower")))
    .withColumn("loan_status_BK", element_at(typedLit(loanStatusBk), col("loan_status")))
    .withColumn("loan_type_BK", element_at(typedLit(loanTypeBk), col("loan_type")))

  /** The projection-only prefix of [[stage]] (everything before the
    * forward fill's exchange): filter → drops → lower → recodes →
    * overwrite → sentinel fill → BK encode. One codegen'd scan stage. */
  def stageNoFill(raw: DataFrame): DataFrame = {
    val filtered = snapshotFilter(raw).drop(Model.earlyDrops: _*)
    val lowered = Exprs.lowerAllStrings(filtered)
    val recoded = borrowerOverwrite(recodes(lowered))
      .na.fill("not_specified", Seq("borrower", "guarantor"))
    encodeBks(recoded)
  }

  /** Full clean stage: raw 33-col page → staged 29-col LoanData. */
  def stage(raw: DataFrame): DataFrame = {
    val encoded = stageNoFill(raw)
    // W1 forward fill — deterministic tie-break on board_approval_date
    // added to the reference's ORDER BY loan_number (declared divergence:
    // ties are nondeterministic in the reference's single-partition window)
    val filled = Ffill.forwardFill(encoded,
      Seq("loan_number", "board_approval_date"), "project_name_")
    derive(filled)
  }

  /** The landed staging's bucket-id column name (see [[stageKeyed]]). */
  val FactPid = "__f_pid"

  /** [[stage]] plus a RETAINED fact-key range-bucket id (VERDICT r9
    * §next-6, the q103 landing fusion): ONE driver-pinned bounds sample
    * over `loan_number` buckets BOTH full-width exchanges of the scaled
    * build — the forward fill's window here, and the fact dedup/SK
    * window downstream ([[graft.ibrd.IbrdWarehouse.factRows]] reuses the
    * landed column AND its hash partitioning, adding ZERO exchanges
    * after the landing). Bucketing on `loan_number` alone is
    * order-consistent for both: it is the MAJOR key of the fill order
    * (loan_number, board_approval_date) and of the fact key
    * (loan_number, end_of_period), and range buckets colocate equal
    * loan_numbers, so within-bucket windows + cross-bucket carries /
    * cumulative offsets see exactly the global order either way.
    * Returns (staged + pid column, pid column name, bucket count);
    * output minus the pid column ≡ [[stage]] bit-for-bit. */
  def stageKeyed(raw: DataFrame): (DataFrame, String, Int) = {
    val encoded = stageNoFill(raw)
    val n = math.max(encoded.rdd.getNumPartitions, 1)
    val spec = graft.warehouse.RangeBuckets.pidExpr(encoded, Seq("loan_number"), n)
    val filled = Ffill.forwardFill(encoded,
      Seq("loan_number", "board_approval_date"), "project_name_",
      pidSpec = Some(spec), keepPidAs = Some(FactPid))
    (derive(filled), FactPid, spec._2)
  }

  private def derive(filled: DataFrame): DataFrame =
    filled
      .withColumn("Repaid", col("repaid_to_ibrd") + col("repaid_3rd_party"))
      .withColumn("Due", col("due_to_ibrd") + col("due_3rd_party"))
      .drop(Model.lateDrops: _*)
}
