package graft.ibrd

import org.apache.spark.sql.types._

/** IBRD loan-statement schemas (SURVEY.md §1.2/§1.3).
  *
  * Raw API page: the 33-column StructType the reference declares by hand at
  * `pyspark_dag2.py:84-116` — strings for all dates (`dd-MMM-yyyy`),
  * doubles for the 13 numeric measures, no inference anywhere.
  */
object Model {

  val rawSchema: StructType = StructType(Seq(
    "end_of_period", "loan_number", "region", "country_code", "country",
    "borrower", "guarantor_country_code", "guarantor", "loan_type",
    "loan_status", "currency_of_commitment", "project_id", "project_name_",
    "agreement_signing_date", "effective_date_most_recent",
    "last_disbursement_date", "first_repayment_date", "last_repayment_date",
    "board_approval_date", "closed_date_most_recent"
  ).map(StructField(_, StringType)) ++ Seq(
    "interest_rate", "original_principal_amount", "cancelled_amount",
    "undisbursed_amount", "disbursed_amount", "repaid_to_ibrd", "due_to_ibrd",
    "exchange_adjustment", "borrowers_obligation", "sold_3rd_party",
    "repaid_3rd_party", "due_3rd_party", "loans_held"
  ).map(StructField(_, DoubleType)))

  /** The 14 kept fiscal snapshot dates (`pyspark_dag2.py:120-121`) — the
    * reference filters raw-cased `dd-MMM-yyyy` strings. */
  val keptSnapshots: Seq[String] =
    (2011 to 2024).map(y => s"30-Jun-$y")

  /** Columns dropped right after the snapshot filter (P2,
    * `pyspark_dag2.py:123,127`). */
  val earlyDrops: Seq[String] = Seq(
    "currency_of_commitment", "exchange_adjustment", "last_disbursement_date",
    "agreement_signing_date", "effective_date_most_recent",
    "closed_date_most_recent")

  /** Columns dropped after deriving repaid/due (P2, `pyspark_dag2.py:382`). */
  val lateDrops: Seq[String] = Seq(
    "repaid_to_ibrd", "repaid_3rd_party", "due_to_ibrd", "due_3rd_party",
    "sold_3rd_party", "loans_held")
}
