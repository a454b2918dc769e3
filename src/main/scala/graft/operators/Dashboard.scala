package graft.operators

import graft.semantic.{Relationship, SemanticModel, Visual}
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def model(s: SparkSession, d: String): SemanticModel = {
    import s.implicits._
    val fact = T.lineitem(s, d)
      .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
    new SemanticModel(
      fact,
      Seq(
        Relationship(T.customer(s, d), "o_custkey", "c_custkey"),
        Relationship(T.nation(s, d), "c_nationkey", "n_nationkey"),
        Relationship(T.region(s, d), "n_regionkey", "r_regionkey"),
        Relationship(T.supplier(s, d), "l_suppkey", "s_suppkey")),
      Map(
        "loans" -> count(lit(1)),
        "loan_amount" -> sum(col("l_extendedprice")),
        "repaid" -> sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        "due" -> sum(col("l_extendedprice") * col("l_discount")),
        "avg_interest_rate" -> avg(col("l_discount")),
        "interest_income" -> sum(col("l_extendedprice") * col("l_discount") * lit(0.01)),
        "borrowers" -> countDistinct(col("o_custkey")),
        "guarantors" -> countDistinct(col("l_suppkey"))))
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
               sum(l_extendedprice) AS loan_amount,
               sum(l_extendedprice * (1.0 - l_discount)) AS repaid,
               sum(l_extendedprice * l_discount) AS due,
               avg(l_discount) AS avg_interest_rate,
               sum(l_extendedprice * l_discount * 0.01) AS interest_income,
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
        SELECT o_orderstatus, count(*) AS loans, sum(l_extendedprice) AS loan_amount
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
        m.visual(Visual(
          measures = Seq("loan_amount", "loans"),
          groupBy = Nil,
          filters = Seq(year($"o_orderdate").isin(1996, 1997, 1998))))
      },
      Some(s"""
        SELECT sum(l_extendedprice) AS loan_amount, count(*) AS loans
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
            sum($"l_extendedprice").as("loan_amount"),
            countDistinct($"o_custkey").as("borrowers"))
          .orderBy($"order_year".asc)
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS loans,
               sum(l_extendedprice) AS loan_amount,
               count(DISTINCT o_custkey) AS borrowers
        $starSql
        GROUP BY order_year
        ORDER BY order_year ASC
      """.stripMargin),
      doc = "date-hierarchy trend visual (A8, O1 asc)"),

    // ---- segment × region matrix with distinct counts ----
    "q34_matrix_segment_region" -> Q(
      (s, d) => model(s, d).visual(Visual(
        measures = Seq("loans", "repaid", "due", "guarantors"),
        groupBy = Seq("c_mktsegment", "r_name"),
        orderBy = Seq(col("c_mktsegment").asc, col("r_name").asc))),
      Some(s"""
        SELECT c_mktsegment, r_name, count(*) AS loans,
               sum(l_extendedprice * (1.0 - l_discount)) AS repaid,
               sum(l_extendedprice * l_discount) AS due,
               count(DISTINCT l_suppkey) AS guarantors
        $starSql
        GROUP BY c_mktsegment, r_name
        ORDER BY c_mktsegment ASC, r_name ASC
      """.stripMargin),
      doc = "matrix visual: 2-dim group, distinct-count measure (A7/A8)")
  )
}
