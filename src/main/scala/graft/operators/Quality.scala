package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
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

  /** Population-stability drift report between two corpus epochs — the
    * monitor a production pipeline runs between crawl snapshots (the
    * q148 time-travel reads are exactly the two inputs at scale; here the
    * epochs are the deterministic doc_id parity split). Per feature, the
    * corpus is bucketed (categorical values as-is, numeric columns into
    * fixed integer-division bins), and each bucket row reports the two
    * epochs' Laplace-smoothed shares plus its PSI term
    * `(pa - pb) · ln(pa / pb)` — smoothing makes empty-on-one-side
    * buckets finite instead of a ln(0) special case.
    *
    * Scale shape: ONE map-side-combined shuffle keyed on
    * (feature, bucket) — both epoch counts are conditional sums in the
    * same aggregate, so adding an epoch or feature never re-scans — then
    * a window over the per-feature handful of bucket rows for totals.
    * Output is bounded by bucket cardinality, independent of corpus
    * size. Shares are ratios of integers (exact IEEE doubles in both
    * engines); only the ln product is rounded. */
  def driftPsi(docs: DataFrame, lenBin: Int = 64, maxBin: Int = 9): DataFrame = {
    val feats = docs
      .select(lit("lang").as("feature"), col("lang").as("bucket"),
        (col("doc_id") % 2).as("epoch"))
      .unionByName(docs.select(lit("len").as("feature"),
        expr(s"CAST(least(n_chars DIV $lenBin, $maxBin) AS STRING)").as("bucket"),
        (col("doc_id") % 2).as("epoch")))
    val counts = feats.groupBy(col("feature"), col("bucket"))
      .agg(sum(when(col("epoch") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("epoch") === 1, 1L).otherwise(0L)).as("nb"))
    val w = Window.partitionBy(col("feature"))
    val pa = (col("na") + lit(1L)).cast("double") / (col("ta") + col("k"))
    val pb = (col("nb") + lit(1L)).cast("double") / (col("tb") + col("k"))
    counts
      .withColumn("ta", sum(col("na")).over(w))
      .withColumn("tb", sum(col("nb")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("feature"), col("bucket"), pa.as("pa"), pb.as("pb"),
        round((pa - pb) * log(pa / pb), 6).as("psi"))
  }

  def queries: Map[String, Q] = Map(
    // ---- cross-epoch drift monitor over the document corpus ----
    "q154_drift_psi" -> Q(
      (s, d) => driftPsi(T.documents(s, d)),
      Some("""
        WITH feats AS (
          SELECT 'lang' AS feature, lang AS bucket, doc_id % 2 AS epoch
          FROM documents
          UNION ALL
          SELECT 'len', CAST(least(n_chars // 64, 9) AS VARCHAR), doc_id % 2
          FROM documents
        ),
        c AS (
          SELECT feature, bucket,
                 count(*) FILTER (WHERE epoch = 0) AS na,
                 count(*) FILTER (WHERE epoch = 1) AS nb
          FROM feats GROUP BY 1, 2
        ),
        t AS (
          SELECT feature, bucket, na, nb,
                 sum(na) OVER (PARTITION BY feature) AS ta,
                 sum(nb) OVER (PARTITION BY feature) AS tb,
                 count(*) OVER (PARTITION BY feature) AS k
          FROM c
        )
        SELECT feature, bucket,
               CAST(na + 1 AS DOUBLE) / (ta + k) AS pa,
               CAST(nb + 1 AS DOUBLE) / (tb + k) AS pb,
               round((CAST(na + 1 AS DOUBLE) / (ta + k)
                      - CAST(nb + 1 AS DOUBLE) / (tb + k))
                     * ln((CAST(na + 1 AS DOUBLE) / (ta + k))
                          / (CAST(nb + 1 AS DOUBLE) / (tb + k))), 6) AS psi
        FROM t
      """.stripMargin),
      doc = "cross-epoch PSI drift report: one conditional-sum shuffle + " +
        "per-feature window; Laplace smoothing keeps one-sided buckets finite"),

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
