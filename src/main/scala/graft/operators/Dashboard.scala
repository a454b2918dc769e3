package graft.operators

import graft.semantic.{FieldParameter, Relationship, SemanticModel, Visual}
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The dashboard query catalog: every measure family from the reference's
  * `_Measures` table (SURVEY.md §2.6 A2–A8, §2.8 O1, §2.2 P6) compiled
  * through the semantic layer over the TESTDATA star schema.
  *
  * Measure mapping (reference measure → star-schema analogue):
  * Loans→count(*), Loan Amount→sum(o_totalprice), Repaid→sum(net revenue),
  * Due1→sum(open balance), Disbursed/Undisbursed→charged/discount splits,
  * Average Inerest Rate (sic)→avg(l_discount), Interest
  * Income→sum(price*discount) (inferred body, SURVEY §7 risk 4),
  * Guarantors/Borrowers→distinct supplier/customer counts.
  */
object Dashboard extends QueryPack {

  /** Order-independent double sum: quantize each row to a DECIMAL, sum
    * exactly, cast back to DOUBLE at the end. Spark's parallel accumulation
    * order differs from any serial engine's at ~1 ulp per add; over 10⁵+
    * rows of ~1e4 values the drift reaches the 4th decimal — right at a
    * hash-comparison rounding boundary. One decimal quantization per row
    * (identical in any IEEE-754 engine) followed by exact integer
    * accumulation makes the result bit-stable under any partitioning, so
    * the plan stays re-orderable (AQE, speculative retries) at 100 TB.
    */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  def model(s: SparkSession, d: String): SemanticModel = {
    import s.implicits._
    val fact = T.lineitem(s, d)
      .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
    new SemanticModel(
      fact,
      Seq(
        // customer/supplier GROW with scale factor — broadcastDim=false
        // leaves the join strategy to AQE (auto-broadcast while small,
        // shuffle join at scale). nation/region are fixed-cardinality
        // dims: always broadcast.
        Relationship(T.customer(s, d), "o_custkey", "c_custkey",
          broadcastDim = false),
        Relationship(T.nation(s, d), "c_nationkey", "n_nationkey"),
        Relationship(T.region(s, d), "n_regionkey", "r_regionkey"),
        Relationship(T.supplier(s, d), "l_suppkey", "s_suppkey",
          broadcastDim = false)),
      Map(
        "loans" -> count(lit(1)),
        "loan_amount" -> dsum(col("l_extendedprice"), 2),
        "repaid" -> dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10),
        "due" -> dsum(col("l_extendedprice") * col("l_discount"), 10),
        "avg_interest_rate" ->
          (sum(col("l_discount").cast(DecimalType(18, 6))).cast("double") / count(lit(1))),
        "interest_income" ->
          dsum(col("l_extendedprice") * col("l_discount") * lit(0.01), 10),
        "borrowers" -> countDistinct(col("o_custkey")),
        "guarantors" -> countDistinct(col("l_suppkey"))),
      // the reference's 3 field-parameter tables (SURVEY §1.3/§3.3):
      // PrmStatus&Type switches the grouping dimension,
      // PrmAmount&Repiad&Due and PrmDorrower&Guarantor switch the measure
      parameters = Map(
        "statusType" -> FieldParameter(Seq("o_orderstatus", "l_linestatus")),
        "amountRepaidDue" -> FieldParameter(Seq("loan_amount", "repaid", "due")),
        "borrowerGuarantor" -> FieldParameter(Seq("borrowers", "guarantors"))),
      // the BI model's date hierarchy (Year → Quarter → Month drill)
      hierarchy = Seq(
        "order_year" -> year(col("o_orderdate")),
        "order_quarter" -> quarter(col("o_orderdate")),
        "order_month" -> month(col("o_orderdate"))))
  }

  // Shared SQL fragment: the expanded star (inner joins, as in the model).
  private val starSql =
    """FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin

  def queries: Map[String, Q] = Map(
    // ---- card visual: all headline measures, no group-by ----
    "q30_measures_card" -> Q(
      (s, d) => model(s, d).visual(Visual(
        measures = Seq("loans", "loan_amount", "repaid", "due",
          "avg_interest_rate", "interest_income", "borrowers", "guarantors"),
        groupBy = Nil)),
      Some(s"""
        SELECT count(*) AS loans,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS repaid,
               CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS due,
               CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_interest_rate,
               CAST(sum(CAST(l_extendedprice * l_discount * 0.01 AS DECIMAL(28,10))) AS DOUBLE) AS interest_income,
               count(DISTINCT o_custkey) AS borrowers,
               count(DISTINCT l_suppkey) AS guarantors
        $starSql
      """.stripMargin),
      doc = "all 8 dashboard measures as one card (SURVEY §2.6 A2-A7)"),

    // ---- clusteredColumnChart: Loans by status, ordered desc ----
    "q31_loans_by_status" -> Q(
      (s, d) => model(s, d).visual(Visual(
        measures = Seq("loans", "loan_amount"),
        groupBy = Seq("o_orderstatus"),
        orderBy = Seq(col("loans").desc, col("o_orderstatus").asc))),
      Some(s"""
        SELECT o_orderstatus, count(*) AS loans,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount
        $starSql
        GROUP BY o_orderstatus
        ORDER BY loans DESC, o_orderstatus ASC
      """.stripMargin),
      doc = "measure grouped by dim attr, order by measure desc (A8/O1)"),

    // ---- line chart: Loan Amount by year, IN-filtered, year asc ----
    "q32_amount_by_year" -> Q(
      (s, d) => {
        import s.implicits._
        val m = model(s, d)
        // the visual's `Year IN (1996,1997,1998)` filter, authored as the
        // equivalent date range so it pushes down to the parquet scan —
        // `year(col) IN (...)` wraps the column in a function and never
        // reaches PushedFilters
        m.visual(Visual(
          measures = Seq("loan_amount", "loans"),
          groupBy = Nil,
          filters = Seq($"o_orderdate".between("1996-01-01", "1998-12-31"))))
      },
      Some(s"""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount,
               count(*) AS loans
        $starSql
        WHERE year(o_orderdate) IN (1996, 1997, 1998)
      """.stripMargin),
      doc = "report-level IN filter pushed into the star (P6)"),

    // ---- per-year trend (grouped variant, year asc) ----
    "q33_trend_by_year" -> Q(
      (s, d) => {
        import s.implicits._
        val m = model(s, d)
        val withYear = m.expanded.withColumn("order_year",
          year($"o_orderdate").cast("int"))
        withYear.groupBy($"order_year")
          .agg(count(lit(1)).as("loans"),
            dsum($"l_extendedprice", 2).as("loan_amount"),
            countDistinct($"o_custkey").as("borrowers"))
          .orderBy($"order_year".asc)
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS loans,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount,
               count(DISTINCT o_custkey) AS borrowers
        $starSql
        GROUP BY order_year
        ORDER BY order_year ASC
      """.stripMargin),
      doc = "date-hierarchy trend visual (A8, O1 asc)"),

    // ---- field parameter: slicer switches the grouping DIMENSION ----
    "q35_param_group_switch" -> Q(
      (s, d) => model(s, d).visual(
        Visual(
          measures = Seq("loans", "loan_amount"),
          groupBy = Seq("@statusType"),
          orderBy = Seq(col("loans").desc, col("l_linestatus").asc)),
        selections = Map("statusType" -> "l_linestatus")),
      Some(s"""
        SELECT l_linestatus, count(*) AS loans,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount
        $starSql
        GROUP BY l_linestatus
        ORDER BY loans DESC, l_linestatus ASC
      """.stripMargin),
      doc = "PrmStatus&Type analogue: slicer rewrites the group-by column (§3.3)"),

    // ---- field parameter: slicer switches the MEASURE ----
    "q36_param_measure_switch" -> Q(
      (s, d) => model(s, d).visual(
        Visual(
          measures = Seq("@amountRepaidDue"),
          groupBy = Seq("o_orderstatus"),
          orderBy = Seq(col("o_orderstatus").asc)),
        selections = Map("amountRepaidDue" -> "repaid")),
      Some(s"""
        SELECT o_orderstatus,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS repaid
        $starSql
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus ASC
      """.stripMargin),
      doc = "PrmAmount&Repiad&Due analogue: slicer rewrites the measure (§3.3)"),

    // ---- field parameter: slicer switches the distinct-count entity ----
    "q37_param_entity_switch" -> Q(
      (s, d) => model(s, d).visual(
        Visual(
          measures = Seq("loans", "@borrowerGuarantor"),
          groupBy = Seq("r_name"),
          orderBy = Seq(col("r_name").asc)),
        selections = Map("borrowerGuarantor" -> "guarantors")),
      Some(s"""
        SELECT r_name, count(*) AS loans,
               count(DISTINCT l_suppkey) AS guarantors
        $starSql
        GROUP BY r_name
        ORDER BY r_name ASC
      """.stripMargin),
      doc = "PrmDorrower&Guarantor analogue: slicer picks the entity count (§3.3)"),

    // ---- date-hierarchy drill: Year → Quarter ----
    "q38_drill_quarter" -> Q(
      (s, d) => model(s, d).drill(
        Visual(measures = Seq("loan_amount", "loans"), groupBy = Nil),
        depth = 2),
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(quarter(o_orderdate) AS INT) AS order_quarter,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount,
               count(*) AS loans
        $starSql
        GROUP BY order_year, order_quarter
        ORDER BY order_year ASC, order_quarter ASC
      """.stripMargin),
      doc = "date hierarchy drilled to quarter (the BI model's drill path)"),

    // ---- date-hierarchy drill: Year → Quarter → Month, year-filtered ----
    "q39_drill_month" -> Q(
      (s, d) => {
        import s.implicits._
        // year filter as a pushable date range (see q32)
        model(s, d).drill(
          Visual(measures = Seq("loan_amount", "loans"), groupBy = Nil,
            filters = Seq($"o_orderdate".between("1997-01-01", "1997-12-31"))),
          depth = 3)
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(quarter(o_orderdate) AS INT) AS order_quarter,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS loan_amount,
               count(*) AS loans
        $starSql
        WHERE year(o_orderdate) IN (1997)
        GROUP BY order_year, order_quarter, order_month
        ORDER BY order_year ASC, order_quarter ASC, order_month ASC
      """.stripMargin),
      doc = "month-level drill with the visual's year IN filter (P6 within drill)"),

    // ---- segment × region matrix with distinct counts ----
    "q34_matrix_segment_region" -> Q(
      (s, d) => model(s, d).visual(Visual(
        measures = Seq("loans", "repaid", "due", "guarantors"),
        groupBy = Seq("c_mktsegment", "r_name"),
        orderBy = Seq(col("c_mktsegment").asc, col("r_name").asc))),
      Some(s"""
        SELECT c_mktsegment, r_name, count(*) AS loans,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS repaid,
               CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS due,
               count(DISTINCT l_suppkey) AS guarantors
        $starSql
        GROUP BY c_mktsegment, r_name
        ORDER BY c_mktsegment ASC, r_name ASC
      """.stripMargin),
      doc = "matrix visual: 2-dim group, distinct-count measure (A7/A8)")
  )
}
