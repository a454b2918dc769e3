package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data-quality validation: declarative rules → a violation report — the
  * audit step every production load runs between staging and publish (the
  * reference's SSIS packages route rows through error outputs per
  * component; here validation is a first-class queryable operator).
  *
  * Scale design: all PREDICATE rules over one table compile into a SINGLE
  * aggregate pass — each rule is one `sum(violated)` conditional in one
  * scan with map-side partial aggregation, so adding a rule costs one
  * codegen'd expression, never a second scan of a 100 TB table. Only
  * cross-table rules (referential orphans) pay a join, and uniqueness
  * rides the same single scan as `count - countDistinct`. The report
  * itself is a handful of rows regardless of input size.
  */
object Quality extends QueryPack {

  /** One predicate rule: `violated` evaluates per-row on the table. */
  final case class Rule(name: String, violated: Column)

  /** All rules in one scan → (rule, n_violations) rows. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    // duplicate names would collide as map keys below (CreateMap's
    // duplicate-key policy is a runtime EXCEPTION, not last-wins)
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).distinct.mkString(", ")}")
    // positional internal aliases: rule names are display strings (dots,
    // spaces — anything), not identifiers to round-trip through resolution.
    // coalesce: sum over ZERO rows is NULL — an empty table has 0
    // violations, not unknown.
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(r.violated, 1L).otherwise(0L)), lit(0L)).as(s"__r$i") }
    df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single agg row to (rule, n_violations); map-explode
      // keeps it one codegen'd projection
      .select(explode(map(
        rules.zipWithIndex.flatMap { case (r, i) =>
          Seq(lit(r.name), col(s"__r$i")) }: _*))
        .as(Seq("rule", "n_violations")))
  }

  /** Uniqueness rule as one scan: rows beyond the first per key tuple.
    * Null-safe: `countDistinct` DROPS any row with a null key component
    * (SQL distinct-aggregate semantics), which would report every
    * null-key row — even a singleton — as a duplicate and diverge from
    * the `count(DISTINCT (a, b))` struct idiom the oracle uses. Counting
    * distinct STRUCTS keeps null components as ordinary values, so both
    * engines agree on nullable keys. Still one hash-aggregate scan. */
  def duplicateCount(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.agg((count(lit(1)) -
        countDistinct(struct(keys.map(col): _*)))
      .as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Referential rule: child keys with no parent (left_anti probe —
    * SURVEY §2.4's fail-on-no-match, reported instead of failed). */
  def orphanCount(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Key-distribution profile: the heaviest `topN` keys with their row
    * counts and corpus share — the diagnostic that decides when a join
    * needs `Skew.saltedJoin`/AQE skew handling BEFORE it falls over at
    * scale. One map-side-combined count aggregate + a
    * TakeOrderedAndProject (never a full sort); the total rides the same
    * pass output via a broadcast scalar. */
  def keyProfile(df: DataFrame, key: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)
      .crossJoin(broadcast(total))
      .select(col(key), col("n"),
        (col("n").cast("double") / col("__total").cast("double")).as("share"))
  }

  def queries: Map[String, Q] = Map(
    // ---- key-skew diagnostic over the stream's natural join key ----
    "q119_key_skew" -> Q(
      (s, d) => keyProfile(T.events(s, d), "user_id", topN = 10),
      Some("""
        SELECT user_id, count(*) AS n,
               CAST(count(*) AS DOUBLE) /
                 (SELECT CAST(count(*) AS DOUBLE) FROM events) AS share
        FROM events
        GROUP BY user_id
        ORDER BY n DESC, user_id ASC
        LIMIT 10
      """.stripMargin),
      doc = "top-N heaviest keys + share: the salting/skew-join decision input (operators.Quality)"),

    // ---- DQ audit report over the staged star ----
    // 6 predicate rules = exactly 2 table scans (one per table), plus the
    // one-join orphan probe and the same-scan-shape duplicate check.
    "q115_dq_report" -> Q(
      (s, d) => {
        import s.implicits._
        val o = T.orders(s, d)
        val li = T.lineitem(s, d)
        val ordersRules = report(o, Seq(
          Rule("orders.null_custkey", $"o_custkey".isNull),
          Rule("orders.nonpositive_totalprice", $"o_totalprice" <= 0.0),
          Rule("orders.bad_status", !$"o_orderstatus".isin("F", "O", "P"))))
        val liRules = report(li, Seq(
          Rule("lineitem.discount_range",
            $"l_discount" < 0.0 || $"l_discount" > 1.0),
          Rule("lineitem.qty_range",
            $"l_quantity" <= 0.0 || $"l_quantity" > 50.0),
          Rule("lineitem.ship_after_1999",
            $"l_shipdate" > lit("1998-12-31").cast("timestamp"))))
        ordersRules
          .unionByName(liRules)
          .unionByName(orphanCount(li, "l_orderkey", o, "o_orderkey",
            "lineitem.orphan_orderkey"))
          .unionByName(duplicateCount(li, "lineitem.dup_pk",
            Seq("l_orderkey", "l_linenumber")))
      },
      Some("""
        SELECT 'orders.null_custkey' AS rule,
               CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders.nonpositive_totalprice',
               count(*) FILTER (WHERE o_totalprice <= 0.0) FROM orders
        UNION ALL
        SELECT 'orders.bad_status',
               count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) FROM orders
        UNION ALL
        SELECT 'lineitem.discount_range',
               count(*) FILTER (WHERE l_discount < 0.0 OR l_discount > 1.0) FROM lineitem
        UNION ALL
        SELECT 'lineitem.qty_range',
               count(*) FILTER (WHERE l_quantity <= 0.0 OR l_quantity > 50.0) FROM lineitem
        UNION ALL
        SELECT 'lineitem.ship_after_1999',
               count(*) FILTER (WHERE l_shipdate > TIMESTAMP '1998-12-31') FROM lineitem
        UNION ALL
        SELECT 'lineitem.orphan_orderkey',
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'lineitem.dup_pk',
               (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                FROM lineitem)
      """.stripMargin),
      doc = "declarative DQ rules -> violation report; N rules = 1 scan (operators.Quality)")
  )
}
