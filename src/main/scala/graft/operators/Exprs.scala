package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar / string / conditional / map expressions + calendar generation.
  *
  * Reference coverage (SURVEY.md §2.3): E1 lower-all-strings
  * (`pyspark_dag2.py:130-132`), E2 dictionary recode (`:304-305`),
  * E3 conditional overwrite (`:307-311`), E4 sentinel null-fill (`:362`),
  * E5 literal-map BK encoding with unmatched→null (`:355-369`),
  * E6 null-propagating arithmetic derivation (`:380-381`), E7 casts
  * (`project SSIS!...loan_fact.dtsx:276-406`), E8 calendar attributes
  * (DimDate, `project SSIS!...loan_fact.dtsx:112`), plus §2.6 A9
  * rollup/cube (beyond-parity exposure).
  *
  * All map lookups are authored as `element_at(typedLit(map), col)` — a
  * single codegen'd expression instead of the reference's 52-deep
  * when/otherwise chain; at 100 TB these are constant-folded per-row ops
  * with zero shuffle.
  */
object Exprs extends QueryPack {

  /** E1: lower() every StringType column, preserving the others. */
  def lowerAllStrings(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == StringType) lower(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

  /** E2/E5: exact-match dictionary recode; unmatched keys keep (E2) or
    * null (E5) per `fallthrough`. */
  def recode(c: Column, m: Map[String, String], keepUnmatched: Boolean): Column = {
    val looked = element_at(typedLit(m), c)
    if (keepUnmatched) coalesce(looked, c) else looked
  }

  // The recode dictionaries for the TESTDATA tables (fixture analogues of
  // the reference's 10 CSV dictionaries, FIXTURES.md §2).
  val regionRecode: Map[String, String] = Map(
    "AFRICA" -> "africa", "AMERICA" -> "americas", "ASIA" -> "asia-pacific",
    "EUROPE" -> "europe", "MIDDLE EAST" -> "mena")
  val regionBk: Map[String, Int] = Map(
    "africa" -> 0, "americas" -> 1, "asia-pacific" -> 2, "europe" -> 3)
  val segmentOverride: Map[String, String] = Map(
    "BUILDING" -> "construction", "MACHINERY" -> "industrial")

  private def caseSql(col: String, m: Seq[(String, String)], elseExpr: String): String =
    m.map { case (k, v) => s"WHEN $col = '$k' THEN '$v'" }
      .mkString("CASE ", " ", s" ELSE $elseExpr END")

  def queries: Map[String, Q] = Map(
    // ---- E1: lower all string columns ----
    "q10_lower_strings" -> Q(
      (s, d) => lowerAllStrings(T.customer(s, d))
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""
        SELECT c_custkey, lower(c_name) AS c_name,
               lower(c_mktsegment) AS c_mktsegment
        FROM customer
      """.stripMargin),
      doc = "lower() over every string column (SURVEY §2.3 E1)"),

    // ---- E2 + E5: dictionary recode then integer BK encoding ----
    "q11_recode_bk" -> Q(
      (s, d) => {
        import s.implicits._
        val r = T.region(s, d)
        r.select(
          $"r_regionkey".cast("int").as("r_regionkey"),
          recode($"r_name", regionRecode, keepUnmatched = true).as("region_clean"))
          .withColumn("region_bk",
            element_at(typedLit(regionBk), $"region_clean").cast("int"))
      },
      Some(s"""
        SELECT CAST(r_regionkey AS INT) AS r_regionkey,
               ${caseSql("r_name", regionRecode.toSeq.sortBy(_._1), "r_name")} AS region_clean,
               CAST(${caseSql(
                 s"(${caseSql("r_name", regionRecode.toSeq.sortBy(_._1), "r_name")})",
                 regionBk.toSeq.sortBy(_._1).map { case (k, v) => (k, v.toString) },
                 "NULL")} AS INT) AS region_bk
        FROM region
      """.stripMargin),
      doc = "dict recode + BK map-encode, unmatched→null (SURVEY §2.3 E2/E5)"),

    // ---- E3: conditional overwrite via map coalesce ----
    "q12_cond_overwrite" -> Q(
      (s, d) => {
        import s.implicits._
        T.customer(s, d).select(
          $"c_custkey",
          coalesce(element_at(typedLit(segmentOverride), $"c_mktsegment"),
            $"c_mktsegment").as("segment"))
      },
      Some(s"""
        SELECT c_custkey,
               ${caseSql("c_mktsegment", segmentOverride.toSeq.sortBy(_._1), "c_mktsegment")} AS segment
        FROM customer
      """.stripMargin),
      doc = "per-key conditional overwrite as one map lookup (SURVEY §2.3 E3)"),

    // ---- E4 + E6: sentinel fill + null-propagating arithmetic ----
    "q13_fill_derive" -> Q(
      (s, d) => {
        import s.implicits._
        // Synthesize nulls deterministically (testdata has none), then
        // exercise na.fill and null-propagating `+`.
        T.customer(s, d).select(
          $"c_custkey",
          when($"c_mktsegment" === "BUILDING", lit(null).cast("string"))
            .otherwise($"c_mktsegment").as("segment_nullable"),
          when($"c_acctbal" < 0, lit(null).cast("double"))
            .otherwise($"c_acctbal").as("bal_nullable"))
          .na.fill("not_specified", Seq("segment_nullable"))
          .withColumn("bal_plus_fee", $"bal_nullable" + lit(10.0))
          .withColumnRenamed("segment_nullable", "segment_filled")
      },
      Some("""
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'not_specified') AS segment_filled,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nullable,
               (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) + 10.0 AS bal_plus_fee
        FROM customer
      """.stripMargin),
      doc = "na.fill sentinel + null-propagating arithmetic (SURVEY §2.3 E4/E6)"),

    // ---- E7: casts at type boundaries ----
    "q14_casts" -> Q(
      (s, d) => {
        import s.implicits._
        T.orders(s, d).select(
          $"o_orderkey".cast("string").as("key_str"),
          $"o_orderdate".cast("date").as("order_date"),
          $"o_totalprice".cast("decimal(18,2)").cast("double").as("price_2dp"),
          lit(1).as("source_system_code"))
      },
      Some("""
        SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dp,
               CAST(1 AS INT) AS source_system_code
        FROM orders
      """.stripMargin),
      doc = "boundary casts incl. decimal(18,2) (SURVEY §2.3 E7)"),

    // ---- E8: DimDate calendar generation ----
    "q15_dimdate" -> Q(
      (s, d) => graft.warehouse.DimDate.fromRange(T.orders(s, d), "o_orderdate"),
      Some("""
        WITH bounds AS (
          SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                 CAST(max(o_orderdate) AS DATE) AS hi
          FROM orders
        ), days AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
          FROM bounds
        )
        SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS INT) AS date_sk,
               d AS cal_date,
               CAST(day(d) AS INT) AS "day",
               CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
               CAST(dayofyear(d) AS INT) AS day_of_year,
               CAST(month(d) AS INT) AS "month",
               monthname(d) AS month_name,
               CAST(quarter(d) AS INT) AS "quarter",
               'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_name,
               CAST(year(d) AS INT) AS "year"
        FROM days
      """.stripMargin),
      doc = "calendar dim via sequence+explode (SURVEY §2.3 E8, §1.3 DimDate)"),

    // ---- A9: rollup over the snowflake hierarchy ----
    "q16_rollup" -> Q(
      (s, d) => {
        import s.implicits._
        T.customer(s, d)
          .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_customers"), sum($"c_acctbal").as("total_bal"))
      },
      Some("""
        SELECT r_name, n_name, count(*) AS n_customers, sum(c_acctbal) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
      """.stripMargin),
      doc = "rollup over region→nation hierarchy (SURVEY §2.6 A9)"),

    // ---- pivot: measure spread over a categorical (the Power BI
    // field-parameter "switch measure/dimension" shape, SURVEY §1.3) ----
    "q18_pivot" -> Q(
      (s, d) => {
        import s.implicits._
        T.lineitem(s, d)
          .groupBy($"l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum($"l_quantity"))
          .withColumnRenamed("F", "qty_f")
          .withColumnRenamed("O", "qty_o")
      },
      Some("""
        SELECT l_returnflag,
               sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
               sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
      """.stripMargin),
      doc = "pivot measure over categorical (field-parameter shape)"),

    // ---- unpivot/melt: wide measures → (metric, value) rows ----
    "q19_unpivot" -> Q(
      (s, d) => {
        import s.implicits._
        T.orders(s, d)
          .select($"o_orderkey", $"o_totalprice",
            $"o_custkey".cast("double").as("custkey_d"))
          .unpivot(
            Array($"o_orderkey"),
            Array($"o_totalprice", $"custkey_d"),
            "metric", "value")
          .groupBy($"metric")
          .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      },
      Some("""
        SELECT metric, count(*) AS n, sum("value") AS total
        FROM (
          SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS "value" FROM orders
          UNION ALL
          SELECT o_orderkey, 'custkey_d', CAST(o_custkey AS DOUBLE) FROM orders
        )
        GROUP BY metric
      """.stripMargin),
      doc = "unpivot wide measures to long form"),

    // ---- A9: cube ----
    "q17_cube" -> Q(
      (s, d) => {
        import s.implicits._
        T.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), avg($"o_totalprice").as("avg_price"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               avg(o_totalprice) AS avg_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
      """.stripMargin),
      doc = "cube aggregation (SURVEY §2.6 A9)")
  )
}
