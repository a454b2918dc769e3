package graft.operators

import graft.warehouse.{DimDate, FactBuilder, Merge, Scd, ScdSpec, Summary}
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse engine queries: SCD initial load + merge, role-playing date
  * dimension, fact assembly through the lookup chain. SURVEY.md §2.4/§2.5.
  *
  * The customer table plays the staged source; the second SCD batch is
  * synthesized deterministically from it (SCD2 change = mktsegment,
  * SCD1 change = acctbal, absent keys, brand-new keys) so the DuckDB
  * oracle can reproduce the exact merge output.
  */
object Warehouse extends QueryPack {

  val custSpec: ScdSpec = ScdSpec(
    bk = "c_custkey",
    scd2 = Seq("c_mktsegment"),
    scd1 = Seq("c_acctbal"),
    fixed = Seq("c_name", "c_nationkey"))

  /** Deterministic second batch: %11 keys absent, %7 SCD2-changed,
    * %5 SCD1-changed, %13 spawn new BKs. */
  def batch2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = T.customer(s, d)
    val base = c.filter($"c_custkey" % 11 =!= 0).select(
      $"c_custkey",
      when($"c_custkey" % 7 === 0, "PROMO").otherwise($"c_mktsegment").as("c_mktsegment"),
      when($"c_custkey" % 5 === 0, $"c_acctbal" + 100.0).otherwise($"c_acctbal").as("c_acctbal"),
      $"c_name", $"c_nationkey")
    val news = c.filter($"c_custkey" % 13 === 0).select(
      ($"c_custkey" + 1000000L).as("c_custkey"),
      lit("NEW").as("c_mktsegment"),
      lit(0.0).as("c_acctbal"),
      lit("new customer").as("c_name"),
      lit(0).cast("int").as("c_nationkey"))
    base.unionByName(news)
  }

  private val dim0Sql =
    """dim0 AS (
      |  SELECT row_number() OVER (ORDER BY c_custkey) AS sk, c_custkey,
      |         c_mktsegment, c_acctbal, c_name, c_nationkey
      |  FROM customer
      |)""".stripMargin

  /** The q21 merge result as a reusable CTE chain (`merged` is the final
    * relation) — shared by q21's oracle and q112's as-of lookup oracle. */
  private val mergedSql =
    s"""$dim0Sql,
      |batch AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 7 = 0 THEN 'PROMO' ELSE c_mktsegment END AS c_mktsegment,
      |         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
      |         c_name, c_nationkey
      |  FROM customer WHERE c_custkey % 11 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEW', 0.0, 'new customer', CAST(0 AS INT)
      |  FROM customer WHERE c_custkey % 13 = 0
      |),
      |untouched AS (
      |  SELECT sk, c_custkey, c_mktsegment, c_acctbal, c_name, c_nationkey,
      |         CAST(1 AS INT) AS source_system_code,
      |         DATE '2024-01-01' AS start_date,
      |         CAST(NULL AS DATE) AS end_date, TRUE AS is_current
      |  FROM dim0 WHERE c_custkey NOT IN (SELECT c_custkey FROM batch)
      |),
      |kept AS (
      |  SELECT d.sk, d.c_custkey, d.c_mktsegment, b.c_acctbal, d.c_name,
      |         d.c_nationkey, CAST(1 AS INT), DATE '2024-01-01',
      |         CAST(NULL AS DATE), TRUE
      |  FROM dim0 d JOIN batch b USING (c_custkey)
      |  WHERE b.c_mktsegment = d.c_mktsegment
      |),
      |expired AS (
      |  SELECT d.sk, d.c_custkey, d.c_mktsegment, d.c_acctbal, d.c_name,
      |         d.c_nationkey, CAST(1 AS INT), DATE '2024-01-01',
      |         DATE '2024-02-01', FALSE
      |  FROM dim0 d JOIN batch b USING (c_custkey)
      |  WHERE b.c_mktsegment <> d.c_mktsegment
      |),
      |ins AS (
      |  SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal, b.c_name, b.c_nationkey
      |  FROM batch b LEFT JOIN dim0 d USING (c_custkey)
      |  WHERE d.c_custkey IS NULL OR d.c_mktsegment <> b.c_mktsegment
      |),
      |inserted AS (
      |  SELECT (SELECT count(*) FROM customer) + row_number() OVER (ORDER BY c_custkey) AS sk,
      |         c_custkey, c_mktsegment, c_acctbal, c_name, c_nationkey,
      |         CAST(1 AS INT), DATE '2024-02-01', CAST(NULL AS DATE), TRUE
      |  FROM ins
      |),
      |merged AS (
      |  SELECT * FROM untouched
      |  UNION ALL SELECT * FROM kept
      |  UNION ALL SELECT * FROM expired
      |  UNION ALL SELECT * FROM inserted
      |)""".stripMargin

  def queries: Map[String, Q] = Map(
    // ---- SCD initial load: dedup + deterministic surrogate keys ----
    "q20_scd_init" -> Q(
      (s, d) => Scd.initialLoad(T.customer(s, d), custSpec, "2024-01-01"),
      Some(s"""
        WITH $dim0Sql
        SELECT sk, c_custkey, c_mktsegment, c_acctbal, c_name, c_nationkey,
               CAST(1 AS INT) AS source_system_code,
               DATE '2024-01-01' AS start_date,
               CAST(NULL AS DATE) AS end_date,
               TRUE AS is_current
        FROM dim0
      """.stripMargin),
      doc = "SCD initial load w/ order-stable SKs (SURVEY §2.5)"),

    // ---- SCD merge: new / unchanged / SCD1-patch / SCD2 expire+insert ----
    "q21_scd_merge" -> Q(
      (s, d) => {
        // merge reads the dim 4x (current/history splits, max(sk), join):
        // cache it once, as a warehouse table would be
        val dim0 = Scd.initialLoad(T.customer(s, d), custSpec, "2024-01-01").cache()
        Scd.merge(dim0, batch2(s, d), custSpec, "2024-02-01")
      },
      Some(s"""
        WITH $mergedSql
        SELECT * FROM merged
      """.stripMargin),
      doc = "set-based SCD merge, full row routing (SURVEY §2.5)"),

    // ---- point-in-time SCD2 lookup: the query side of slowly-changing
    // dimensions ----
    // Every SCD2 warehouse eventually asks "which version was valid on
    // date D?" — an equi-join on the BK with the validity range as a
    // residual predicate. At scale the join shuffles on the BK alone
    // (versions per BK are SCD-bounded — a handful — so the residual
    // scan per key is constant work, never a range-join blowup); probes
    // that predate every version keep their row with null attributes
    // (the LEFT join is part of the contract: "no version valid" is an
    // answer). Probed at one date inside v1's validity and one after the
    // merge, so expired, current, inserted-later and never-valid rows
    // all appear in the output.
    "q112_dim_asof" -> Q(
      (s, d) => {
        import s.implicits._
        val dim0 = Scd.initialLoad(T.customer(s, d), custSpec, "2024-01-01").cache()
        val dim = Scd.merge(dim0, batch2(s, d), custSpec, "2024-02-01")
        val probes = dim.select($"c_custkey").distinct()
          .select($"c_custkey", explode(array(
            lit("2024-01-15"), lit("2024-03-01"))).as("asof"))
          .withColumn("asof", $"asof".cast("date"))
        val dimv = dim.select($"c_custkey".as("d_key"), $"sk",
          $"c_mktsegment", $"start_date", $"end_date")
        probes.join(dimv,
            probes("c_custkey") === dimv("d_key") &&
              dimv("start_date") <= probes("asof") &&
              (dimv("end_date").isNull || probes("asof") < dimv("end_date")),
            "left")
          .select($"c_custkey", $"asof",
            $"sk".as("sk_at"), $"c_mktsegment".as("segment_at"))
      },
      Some(s"""
        WITH $mergedSql,
        probes AS (
          SELECT DISTINCT c_custkey, CAST(d AS DATE) AS asof
          FROM merged, unnest(['2024-01-15', '2024-03-01']) t(d)
        )
        SELECT p.c_custkey, p.asof, m.sk AS sk_at,
               m.c_mktsegment AS segment_at
        FROM probes p LEFT JOIN merged m
          ON p.c_custkey = m.c_custkey AND m.start_date <= p.asof
         AND (m.end_date IS NULL OR p.asof < m.end_date)
      """.stripMargin),
      doc = "point-in-time SCD2 lookup: BK equi-join + validity-range residual (as-of dimension query)"),

    // ---- generic MERGE INTO: the lakehouse upsert primitive ----
    // Delta-style MERGE as ONE full-outer shuffle join + routing
    // projection (warehouse.Merge) — the set-based form of the
    // reference's per-row UPDATE side-channel (SURVEY §2.1 S9). The
    // change batch is deterministic so DuckDB can rebuild the exact
    // post-merge table state: %11 keys tombstone (delete), %7 (minus
    // the tombstoned) reprice (update), %13 spawn new keys (insert).
    "q113_merge_upsert" -> Q(
      (s, d) => {
        import s.implicits._
        val o = T.orders(s, d).select(
          $"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
        val del = o.filter($"o_orderkey" % 11 === 0)
          .withColumn("op", lit("D"))
        val upd = o.filter($"o_orderkey" % 7 === 0 && $"o_orderkey" % 11 =!= 0)
          .withColumn("o_totalprice", $"o_totalprice" + 50.0)
          .withColumn("op", lit("U"))
        // insert keys are −k−1: source orderkeys are ≥ 0 at every SF
        // (this corpus includes key 0), so the inserted keyspace is
        // strictly negative and can never collide with existing target
        // keys (a fixed "+10M" offset collided from SF ~1.7, silently
        // turning inserts into matched updates and violating Merge's
        // one-row-per-key contract — ADVICE r9)
        val ins = o.filter($"o_orderkey" % 13 === 0).select(
          (-$"o_orderkey" - 1L).as("o_orderkey"), $"o_custkey",
          lit("N").as("o_orderstatus"),
          lit(0.0).as("o_totalprice"), lit("I").as("op"))
        val batch = del.unionByName(upd).unionByName(ins)
        Merge.upsert(o, batch, "o_orderkey", deleteWhen = col("op") === "D")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        ),
        upd AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice + 50.0 AS o_totalprice
          FROM o WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
        )
        SELECT * FROM o
        WHERE o_orderkey % 11 <> 0
          AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        UNION ALL SELECT * FROM upd
        UNION ALL
        SELECT -o_orderkey - 1, o_custkey, 'N',
               CAST(0.0 AS DOUBLE)
        FROM o WHERE o_orderkey % 13 = 0
      """.stripMargin),
      doc = "generic MERGE INTO: update/delete/insert routing in one full-outer join (warehouse.Merge)"),

    // ---- incremental materialized-aggregate maintenance ----
    // the summary-table half of the lakehouse loop: q113 merges the
    // batch into the base, THIS keeps the grouped rollup current from
    // the batch alone (warehouse.Summary — retract before-images,
    // assert after-images, one batch-keyed join + a |groups| aggregate;
    // the base is never rescanned). The batch deliberately migrates
    // rows BETWEEN groups (updates flip status to 'P') so the
    // retract/assert pair is exercised, and the oracle recomputes the
    // summary from the post-merge table — incremental must equal
    // recompute exactly (decimal-folded measures).
    "q127_agg_maintain" -> Q(
      (s, d) => {
        import s.implicits._
        val o = T.orders(s, d)
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        val del = o.filter($"o_orderkey" % 11 === 0).withColumn("op", lit("D"))
        val upd = o.filter($"o_orderkey" % 7 === 0 && $"o_orderkey" % 11 =!= 0)
          .withColumn("o_orderstatus", lit("P"))
          .withColumn("o_totalprice", $"o_totalprice" + 50.0)
          .withColumn("op", lit("U"))
        val ins = o.filter($"o_orderkey" % 13 === 0).select(
          (-$"o_orderkey" - 1L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          lit(1000.0).as("o_totalprice"), lit("I").as("op"))
        val batch = del.unionByName(upd).unionByName(ins)
        val summary = Summary.summarize(o, $"o_orderstatus", $"o_totalprice")
        Summary.maintain(summary, o, batch, "o_orderkey",
          $"o_orderstatus", $"o_totalprice", deleteWhen = $"op" === "D")
          // the exact decimal accumulator is carried state, not output
          .drop("__t")
          .withColumnRenamed("grp", "o_orderstatus")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ),
        merged AS (
          SELECT o_orderstatus, o_totalprice FROM o
          WHERE o_orderkey % 11 <> 0 AND o_orderkey % 7 <> 0
          UNION ALL
          SELECT 'P', o_totalprice + 50.0 FROM o
          WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
          UNION ALL
          SELECT 'N', 1000.0 FROM o WHERE o_orderkey % 13 = 0
        )
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderstatus
      """.stripMargin),
      doc = "incremental summary maintenance: delta retract/assert vs full recompute (warehouse.Summary)"),

    // ---- fact assembly: lookup chain + role-playing date dim ----
    "q22_fact_build" -> Q(
      (s, d) => {
        import s.implicits._
        val li = T.lineitem(s, d)
        val o = T.orders(s, d)
        val dimCust = Scd.initialLoad(T.customer(s, d), custSpec, "2024-01-01")
          .filter($"is_current")
          .withColumnRenamed("sk", "cust_sk")
        val allDates = o.select($"o_orderdate".cast("date").as("dt"))
          .unionByName(li.select($"l_shipdate".cast("date").as("dt")))
        val dd = DimDate.fromRange(allDates, "dt").select("date_sk", "cal_date")
        val fact = li.join(o, $"l_orderkey" === $"o_orderkey")
        val out = FactBuilder.build(fact, Seq(
          FactBuilder.Lookup(dimCust, col("o_custkey"), "c_custkey",
            Seq("cust_sk" -> "cust_sk")),
          FactBuilder.Lookup(dd.withColumnRenamed("date_sk", "order_date_sk"),
            col("o_orderdate").cast("date"), "cal_date",
            Seq("order_date_sk" -> "order_date_sk")),
          FactBuilder.Lookup(dd.withColumnRenamed("date_sk", "ship_date_sk"),
            col("l_shipdate").cast("date"), "cal_date",
            Seq("ship_date_sk" -> "ship_date_sk"))))
        out.select(
          $"l_orderkey", $"l_linenumber", $"cust_sk",
          $"order_date_sk", $"ship_date_sk",
          $"l_quantity".as("quantity"),
          $"l_extendedprice".cast("decimal(18,2)").cast("double").as("principal"))
      },
      Some(s"""
        WITH $dim0Sql,
        bounds AS (
          SELECT LEAST((SELECT CAST(min(o_orderdate) AS DATE) FROM orders),
                       (SELECT CAST(min(l_shipdate) AS DATE) FROM lineitem)) AS lo,
                 GREATEST((SELECT CAST(max(o_orderdate) AS DATE) FROM orders),
                          (SELECT CAST(max(l_shipdate) AS DATE) FROM lineitem)) AS hi
        ),
        dd AS (
          SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS INT) AS date_sk, d
          FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds)
        )
        SELECT l_orderkey, l_linenumber, dim0.sk AS cust_sk,
               d1.date_sk AS order_date_sk, d2.date_sk AS ship_date_sk,
               l_quantity AS quantity,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS principal
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN dim0 ON o_custkey = c_custkey
        JOIN dd d1 ON CAST(o_orderdate AS DATE) = d1.d
        JOIN dd d2 ON CAST(l_shipdate AS DATE) = d2.d
      """.stripMargin),
      doc = "fact build: lookup chain + 4-role date joins (SURVEY §2.4 J1/J2)"),

    // ---- salted join: result-identity under skew mitigation ----
    // Skew.saltedJoin spreads each hot key over `salt` reducers; the
    // result set must be IDENTICAL to the plain join — which is exactly
    // what the plain-SQL oracle asserts through the hash gate.
    "q45_salted_join" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val cohorts = ev.select($"user_id").distinct()
          .withColumn("cohort", pmod($"user_id", lit(10)).cast("int"))
        graft.warehouse.Skew.saltedJoin(ev, cohorts, "user_id", salt = 8)
          .groupBy($"cohort")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(28,10)")).cast("double").as("total_value"))
      },
      Some("""
        WITH cohorts AS (
          SELECT DISTINCT user_id, CAST(user_id % 10 AS INT) AS cohort
          FROM events
        )
        SELECT cohort, count(*) AS n,
               CAST(sum(CAST("value" AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM events e JOIN cohorts c USING (user_id)
        GROUP BY cohort
      """.stripMargin),
      doc = "salted-join result identity: hot keys spread over 8 reducers (SCALE)"),

    // ---- bucketed co-located join: the shuffle-free big-big join ----
    // Both sides are written bucketed+sorted on the join key, so the scan
    // itself reports the hash partitioning and the sort-merge join runs
    // with NO exchange on either side — at 100 TB this is the difference
    // between re-shuffling the fact table on every join and paying the
    // layout cost once at write time. The result must be IDENTICAL to the
    // plain join, which is what the oracle's hash gate asserts; ScaleSpec
    // asserts the executed plan's only exchange is the final aggregate's.
    "q80_bucketed_join" -> Q(
      (s, d) => bucketedJoin(s, d),
      Some("""
        SELECT o_orderpriority, count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
      """.stripMargin),
      doc = "bucketed co-located join: zero-exchange sort-merge join (SCALE)")
  )

  // bucketed copies of lineitem/orders, written once per (session, sfDir):
  // the one-time layout cost a warehouse pays at load time so every later
  // fact join is exchange-free. External tables under a temp root; the
  // session catalog carries the bucketing metadata.
  // weak session keys (nested per-dir map): a discarded session must not
  // stay pinned by this fixture cache — a tuple key in a WeakHashMap
  // would be collected immediately (nothing else references the tuple),
  // so the session itself is the weak key
  private val bucketCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, (String, String)]]())

  private def bucketedTables(s: SparkSession, d: String): (String, String) = {
    val perDir = bucketCache.computeIfAbsent(s,
      _ => scala.collection.concurrent.TrieMap.empty[String, (String, String)])
    // TrieMap.getOrElseUpdate may run a racing thunk twice; the builder
    // creates catalog tables (second run would hit "table already
    // exists"), so serialize it per session — exactly-once like the
    // ConcurrentHashMap.computeIfAbsent it replaced
    perDir.synchronized {
      perDir.getOrElseUpdate(d, { val (session, dir) = (s, d)
      val tag = f"${dir.hashCode & 0xffffffffL}%08x"
      val ltab = s"graft_lineitem_b_$tag"
      val otab = s"graft_orders_b_$tag"
      val root = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
      graft.sources.TableSink.writeBucketed(
        T.lineitem(session, dir).select(col("l_orderkey"), col("l_extendedprice")),
        ltab, 8, Seq("l_orderkey"), Some(s"$root/lineitem"))
      graft.sources.TableSink.writeBucketed(
        T.orders(session, dir).select(col("o_orderkey"), col("o_orderpriority")),
        otab, 8, Seq("o_orderkey"), Some(s"$root/orders"))
      (ltab, otab)
      })
    }
  }

  /** Zero-exchange join of the bucketed copies (MERGE hint pins the
    * sort-merge strategy so the small-SF broadcast path can't mask the
    * bucketing behavior being demonstrated). */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (ltab, otab) = bucketedTables(s, d)
    s.table(ltab).hint("MERGE")
      .join(s.table(otab), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(28,2)")).cast("double").as("revenue"))
  }
}
