package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Frozen goldens for the catalog entries that have NO DuckDB oracle
  * (q09 approx sketch; q56/q57/q65 seeded hash families — VERDICT r7
  * §next-7): the driver only row-count-checks these, so a silent change
  * in a hash family (seed, mixing, banding) would pass every gate. Pin
  * the exact output — row count plus an order-independent content hash
  * (sum over per-row xxhash64 of all columns cast to string) — at
  * sf0.001. All four queries are fully deterministic by design, so any
  * drift here is a behavior change, not flakiness; if one is ever
  * changed ON PURPOSE, re-record with
  * `sbt -batch "testOnly graft.GoldenSpec" -DGRAFT_RECORD_GOLDENS=1`
  * (prints the new values) and update the constants. */
class GoldenSpec extends SparkSpec {

  private def fingerprint(name: String): (Long, String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    val hashed = df.select(
      xxhash64(df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*)
        .cast("decimal(38,0)").as("h")) // decimal: ANSI-safe accumulation
    val n = hashed.count()
    // sum is commutative: the fingerprint ignores row order but pins
    // every value of every column
    val h = if (n == 0) "0"
    else hashed.agg(sum(col("h"))).head.getDecimal(0).toBigInteger.toString
    (n, h)
  }

  private val goldens: Map[String, (Long, String)] = Map(
    "q09_approx_distinct" -> (3L, "7454462763602966129"),
    "q56_minhash_lsh" -> (7094L, "-697264253238091751831"),
    "q57_simhash" -> (496L, "-43205328574127921020"),
    "q65_simhash_neardup" -> (608L, "76676838230734004974"))

  goldens.foreach { case (name, (wantRows, wantHash)) =>
    test(s"golden: $name output is frozen (rows + content hash)") {
      val (n, h) = fingerprint(name)
      if (sys.props.contains("GRAFT_RECORD_GOLDENS") ||
        sys.env.contains("GRAFT_RECORD_GOLDENS")) {
        info(s"""RECORD "$name" -> ($n L, "$h")""")
      } else {
        assert(n == wantRows && h == wantHash,
          s"$name drifted: got ($n, $h), frozen ($wantRows, $wantHash) — " +
            "a hash-family behavior change? If intentional, re-record.")
      }
    }
  }
}
