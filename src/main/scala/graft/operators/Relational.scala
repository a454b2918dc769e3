package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._

/** Core relational spine: scans, projections, IN-list filters, distinct,
  * star-schema broadcast joins, semi/anti joins, top-k.
  *
  * Reference coverage (SURVEY.md §2): S6/S7 (table scan / DISTINCT scan),
  * P1 (IN-list filter, `pyspark_dag2.py:120-126`), P3 (projection),
  * A1 (DISTINCT, `project SSIS!...loan_type_dim.dtsx:565`), J1 (full-cache
  * lookup == broadcast hash join, `project SSIS!...loan_fact.dtsx:60-1710`),
  * the "fail on no-match" probe as a left_anti (`loan_fact.dtsx:92-96`),
  * O1 (order by measure desc), O4 (top-k, exposed beyond reference parity).
  */
object Relational extends QueryPack {

  /** Portable-HLL shape (q128): m = 2^8 registers over the 60-bit
    * PortableHash domain. `HllAlphaNum` = α_m·m²·2^60 precomputed ONCE —
    * the identical double literal lands in both the Spark plan and the
    * generated oracle SQL (Double.toString round-trips exactly), so the
    * single float division runs on bit-identical inputs in both engines. */
  /** q09's default relative standard deviation (Spark's
    * `approx_count_distinct` rsd) and the accuracy verdict bound derived
    * from it: 3 standard deviations — a deterministic pass on fixed data
    * (the sketch is deterministic per input). */
  val ApproxDistinctRsd = 0.05
  val ApproxDistinctBound: Double = 3 * ApproxDistinctRsd

  val HllM = 256
  val HllAlphaNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM.toDouble * HllM.toDouble *
      (1L << 60).toDouble

  def queries: Map[String, Q] = Map(
    // ---- pricing summary: filter + groupBy + multi-agg (TPC-H Q1 shape) ----
    "q01_pricing_summary" -> Q(
      (s, d) => {
        import s.implicits._
        T.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            // money sums run through DECIMAL on both sides: a raw double
            // sum's accumulation-order drift (~1e-7 relative at 600k rows)
            // sits exactly at the driver's round(4) hash boundary — the
            // q33 failure class from round 1 (integer-valued doubles like
            // l_quantity are exact under double sum and stay raw)
            sum($"l_quantity").as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(28,2)")).cast("double")
              .as("sum_base_price"),
            sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
            avg($"l_quantity").as("avg_qty"),
            avg($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
               avg(l_quantity) AS avg_qty,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
      """.stripMargin),
      doc = "filter + groupBy + sum/avg/count (SURVEY §2.2 P1, §2.6 A2-A5)"),

    // ---- IN-list filter (the reference's 14-snapshot-date filter shape) ----
    "q02_filter_in" -> Q(
      (s, d) => {
        import s.implicits._
        T.orders(s, d)
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), sum($"o_totalprice").as("total"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_orders, sum(o_totalprice) AS total
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderpriority
      """.stripMargin),
      doc = "IN-list filter (SURVEY §2.2 P1: pyspark_dag2.py:120-126)"),

    // ---- star-schema join chain: fact x 4 dims, small dims broadcast ----
    "q03_star_join" -> Q(
      (s, d) => {
        import s.implicits._
        val li = T.lineitem(s, d)
        val o = T.orders(s, d)
        val c = T.customer(s, d)
        val n = T.nation(s, d)
        val r = T.region(s, d)
        // orders is fact-sized: shuffle hash/sort-merge on the key.
        // nation/region are TRUE dimensions (fixed cardinality):
        // broadcast (the Spark analogue of SSIS full-cache Lookup, SURVEY
        // §2.4 J1). customer GROWS with scale factor — no explicit hint:
        // AQE auto-broadcasts it while it fits the threshold and falls
        // back to a shuffle join when it doesn't (an unconditional
        // broadcast(c) is an executor OOM at 100 TB).
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .cast("decimal(28,6)")).cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
      """.stripMargin),
      doc = "10-lookup fact-build chain as broadcast joins (SURVEY §2.4 J1)"),

    // ---- DISTINCT source scan (loan_type dim source shape) ----
    "q04_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        T.part(s, d).select($"p_brand", $"p_type").distinct()
      },
      Some("SELECT DISTINCT p_brand, p_type FROM part"),
      doc = "SELECT DISTINCT scan (SURVEY §2.1 S7, §2.6 A1)"),

    // ---- anti join: "fail on no-match" probe / orphan check ----
    "q05_anti_join" -> Q(
      (s, d) => {
        import s.implicits._
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter($"o_totalprice" > 300000.0)
        c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers_no_big_orders"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers_no_big_orders
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        GROUP BY c_mktsegment
      """.stripMargin),
      doc = "left_anti dangling-key probe (SURVEY §2.4: NoMatchBehavior=0)"),

    // ---- semi join ----
    "q06_semi_join" -> Q(
      (s, d) => {
        import s.implicits._
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter($"o_totalprice" > 100000.0)
        c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_big_customers"))
          .withColumn("c_nationkey", $"c_nationkey".cast("int"))
      },
      Some("""
        SELECT CAST(c_nationkey AS INT) AS c_nationkey, count(*) AS n_big_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        GROUP BY c_nationkey
      """.stripMargin),
      doc = "left_semi EXISTS probe"),

    // ---- top-k with deterministic tiebreak ----
    "q07_topk" -> Q(
      (s, d) => {
        import s.implicits._
        T.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(25)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 25
      """.stripMargin),
      doc = "order-by-measure-desc + top-k (SURVEY §2.8 O1/O4)"),

    // ---- approx distinct count (A7 scale path; HLL sketch) ----
    // rows-only: DuckDB's approx_count_distinct uses a different sketch;
    // ApproxSpec bounds the relative error against the exact count and
    // GoldenSpec pins the output. q128 below is the fully-ORACLED twin
    // (portable register hash, exact-integer harmonic fold) — the proof
    // that only the engine-specific builtin, not the sketch idea, is
    // un-oracle-able.
    // Driver-evaluable since round 11 (VERDICT r10 §next-7): the raw
    // sketch value is engine-private (DuckDB cannot replay Spark's HLL++
    // — q128 is the portable, fully-hash-oracled twin), so the ORACLED
    // contract here is the published error bound itself: the entry
    // computes |approx − exact| / exact per group IN SPARK and emits a
    // boolean verdict; the oracle asserts every group's verdict is true.
    // The oracle checks the VERDICT, not the sketch (a systematic error
    // hitting approx and exact identically would pass it) — the sketch
    // itself is covered by the OTHER two legs: GoldenSpec pins the raw
    // approx values on fixture data, and ApproxSpec independently
    // cross-checks approx vs exact within 5%. Bound derivation below is
    // the named-constant form (advisor r11): 3× the default rsd.
    "q09_approx_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        T.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey").as("approx_parts"),
            count_distinct($"l_partkey").as("exact_parts"),
            count(lit(1)).as("n_lines"))
          .select($"l_returnflag", $"n_lines",
            (abs($"approx_parts" - $"exact_parts")
              <= $"exact_parts" * ApproxDistinctBound).as("within_bound"))
      },
      Some("""
        SELECT l_returnflag, count(*) AS n_lines, true AS within_bound
        FROM lineitem GROUP BY l_returnflag
      """.stripMargin),
      doc = "approx_count_distinct within its published error bound — the at-scale variant of A7 (SURVEY §2.6)"),

    // ---- PORTABLE HyperLogLog (q09's fully-oracled twin, r10) ----
    // The same sketch idea as q09 but every step is deterministic
    // arithmetic both engines compute identically, so even the
    // APPROXIMATE answer hash-matches a DuckDB oracle: register = low 8
    // bits of the md5-derived 60-bit hash (PortableHash's domain),
    // rho = leading-zero rank of the remaining 52 bits via length(bin(w))
    // (both engines have bin()), per-register max, and the raw HLL
    // harmonic estimate with the register sum folded EXACTLY — each
    // register contributes 2^(60-M) as an integer, summed in
    // DECIMAL(38,0)/HUGEINT, so no float accumulation anywhere; the one
    // double division happens once on identical inputs. Deliberately
    // the RAW estimate (no small-range linear counting — that needs ln(),
    // whose last-ulp is libm-dependent); accuracy at HLL's operating
    // range is property-tested in ApproxSpec. Shuffle is ≤ groups×256
    // register rows — the sketch property that makes it the at-scale
    // distinct-count (one narrow aggregate, no distinct expansion).
    "q128_hll_portable" -> Q(
      (s, d) => {
        import s.implicits._
        val h = conv(substring(md5($"l_partkey".cast("string")), 1, 15), 16, 10)
          .cast("long")
        val w = shiftrightunsigned(h, 8) // integer shift — h/256.0 would
                                         // lose bits past double's mantissa
        val rho = when(w === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(w)))
        val regs = T.lineitem(s, d)
          .select($"l_returnflag", pmod(h, lit(HllM.toLong)).as("j"),
            rho.as("rho"))
          .groupBy($"l_returnflag", $"j")
          .agg(max($"rho").as("m"))
        regs.groupBy($"l_returnflag")
          // column-valued shift amount: the Scala shiftleft() helper only
          // takes a literal Int, the SQL form takes expressions
          .agg(sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - m AS INT)) AS DECIMAL(38,0))"))
              .as("s_obs"),
            count(lit(1)).as("n_regs"))
          .select($"l_returnflag",
            round(lit(HllAlphaNum) /
              ($"s_obs" + (lit(HllM.toLong) - $"n_regs") *
                lit(java.math.BigDecimal.valueOf(1L << 60))).cast("double"), 2)
              .as("est_parts"))
      },
      Some(s"""
        WITH h AS (
          SELECT l_returnflag,
                 (${graft.functions.PortableHash.hi60Sql("m")}) AS h
          FROM (SELECT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS m
                FROM lineitem)
        ),
        r AS (
          SELECT l_returnflag, h % $HllM AS j,
                 CASE WHEN h // $HllM = 0 THEN 53
                      ELSE 53 - length(bin(h // $HllM)) END AS rho
          FROM h
        ),
        regs AS (
          SELECT l_returnflag, j, max(rho) AS m FROM r GROUP BY l_returnflag, j
        )
        SELECT l_returnflag,
               round($HllAlphaNum /
                 CAST(sum(CAST((1::BIGINT << (60 - m)) AS DECIMAL(38,0)))
                      + ($HllM - count(*)) * CAST((1::BIGINT << 60) AS DECIMAL(38,0))
                   AS DOUBLE), 2) AS est_parts
        FROM regs
        GROUP BY l_returnflag
      """.stripMargin),
      doc = "portable HLL distinct estimate — the sketch itself hash-matches the oracle"),

    // ---- per-group top-k (salted two-stage) ----
    // "top 3 customers by spend per nation": the report staple that, done
    // naively, is one window over everything partitioned by a LOW-cardinality
    // group (25 nations) — at 100 TB each nation's whole customer set lands
    // on one reducer for the sort. Two fixes compose here: (1) rank over the
    // PRE-AGGREGATED (nation, customer) spend table, never the fact table;
    // (2) salt the first ranking pass by pmod(custkey, 64) so each reducer
    // sorts 1/64 of a nation, then re-rank only the ≤64·k survivors — exact,
    // because a global top-k row is necessarily in its salt-slice's top-k.
    // Deterministic tiebreak (spend DESC, custkey ASC) end-to-end.
    "q116_group_topk" -> Q(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val spend = T.orders(s, d)
          .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name", $"o_custkey")
          .agg(sum($"o_totalprice".cast("decimal(28,2)")).cast("double")
            .as("spend"))
        val salted = Window
          .partitionBy($"n_name", pmod($"o_custkey", lit(64)))
          .orderBy($"spend".desc, $"o_custkey".asc)
        val survivors = spend
          .withColumn("srk", row_number().over(salted))
          .filter($"srk" <= 3).drop("srk")
        val perGroup = Window.partitionBy($"n_name")
          .orderBy($"spend".desc, $"o_custkey".asc)
        survivors.withColumn("rnk", row_number().over(perGroup))
          .filter($"rnk" <= 3)
      },
      Some("""
        WITH spend AS (
          SELECT n_name, o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          GROUP BY n_name, o_custkey
        )
        SELECT n_name, o_custkey, spend, rnk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY n_name
                   ORDER BY spend DESC, o_custkey ASC) AS INT) AS rnk
          FROM spend)
        WHERE rnk <= 3
      """.stripMargin),
      doc = "per-group top-k: pre-agg + salted two-stage rank (no one-reducer-per-group sort)"),

    // ---- union of disjoint splits (page-accumulate shape) ----
    "q08_union" -> Q(
      (s, d) => {
        import s.implicits._
        val o = T.orders(s, d)
        val a = o.filter($"o_orderstatus" === "F")
        val b = o.filter($"o_orderstatus" =!= "F")
        a.unionByName(b)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("total"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total
        FROM (
          SELECT * FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT * FROM orders WHERE o_orderstatus <> 'F'
        )
        GROUP BY o_orderstatus
      """.stripMargin),
      doc = "unionByName page-accumulate (SURVEY §2.8 O2/O3)")
  )
}
