package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{approx_count_distinct, col, count, lit, sum, xxhash64}

/** Frozen goldens for the sketch-family catalog entries. q09 (HLL) has
  * NO DuckDB oracle — this pin is its only content check. q56/q57/q65
  * became fully DuckDB-oracled in round 10 (portable md5+affine hash
  * family, see PortableHash); their pins are kept as a fast local
  * tripwire that catches a hash-family change without a Verify+DuckDB
  * round-trip. Pin = row count plus an order-independent content hash
  * (sum over per-row xxhash64 of all columns cast to string) at
  * sf0.001.
  *
  * DRIFT TRIAGE (VERDICT r8 §next-7 / ADVICE r8): the goldens are
  * functions of the /root/testdata/sf0.001 bytes, which the round driver
  * REGENERATES — content and even column types have drifted between
  * rounds. The input-fingerprint tests below pin the source tables
  * themselves, so the two failure modes read differently:
  *  - input test fails → the testdata changed; nothing is wrong with the
  *    engine — re-record BOTH maps;
  *  - input test passes but a golden fails → a real hash-family behavior
  *    change; fix it or (if intentional) re-record the golden.
  * Re-record with the ENV VAR form (sbt's `-D` system properties do NOT
  * reach the forked test JVM — `Test/fork := true`):
  * `GRAFT_RECORD_GOLDENS=1 sbt -batch "testOnly graft.GoldenSpec"`
  * (prints RECORD lines for both maps). All four queries are fully
  * deterministic by design, so any drift is a change, not flakiness. */
class GoldenSpec extends SparkSpec {

  private def fingerprintDf(df: DataFrame): (Long, String) = {
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

  /** q09's CATALOG entry became a bounded-error verdict in round 11
    * (driver-oracled, VERDICT r10 §next-7); the golden keeps pinning
    * the RAW sketch values — recomputed here in the entry's pre-r11
    * shape — so a sketch behavior change still trips this test even
    * though it stays inside the 15% verdict bound. */
  private def rawQ09: DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
        count(lit(1)).as("n_lines"))
  }

  private def fingerprint(name: String): (Long, String) =
    fingerprintDf(if (name == "q09_approx_distinct") rawQ09
                  else SparkEntry.queries(name)(spark, sf))

  private val recordMode: Boolean =
    sys.props.contains("GRAFT_RECORD_GOLDENS") ||
      sys.env.contains("GRAFT_RECORD_GOLDENS")

  /** (rows, content hash) of each sf0.001 INPUT table the golden queries
    * read — the string-cast content hash also moves on a types-only
    * regeneration (the round-7 timestamp[us] surprise), so either kind
    * of drift lands in the clearly-labeled input test. */
  private val inputGoldens: Map[String, (Long, String)] = Map(
    "lineitem" -> (6000L, "-631748632673188615868"),
    "documents" -> (500L, "24337287384626591008"))

  private val goldens: Map[String, (Long, String)] = Map(
    "q09_approx_distinct" -> (3L, "7454462763602966129"),
    "q56_minhash_lsh" -> (7053L, "-830702421701623303626"),
    "q57_simhash" -> (496L, "69687426511171165128"),
    "q65_simhash_neardup" -> (592L, "48915193951879312228"))

  inputGoldens.foreach { case (table, (wantRows, wantHash)) =>
    test(s"golden input: $table @ sf0.001 is the corpus the goldens were recorded on") {
      val (n, h) = fingerprintDf(Tables(spark, sf, table))
      if (recordMode) {
        info(s"""RECORD input "$table" -> (${n}L, "$h")""")
      } else {
        assert(n == wantRows && h == wantHash,
          s"TESTDATA CHANGED: $table @ $sf is not the corpus the goldens " +
            s"were recorded on (got ($n, $h), recorded ($wantRows, $wantHash)). " +
            "The round driver regenerates testdata — this is NOT an engine " +
            "regression. Re-record: GRAFT_RECORD_GOLDENS=1 sbt -batch " +
            "\"testOnly graft.GoldenSpec\" and update both maps.")
      }
    }
  }

  goldens.foreach { case (name, (wantRows, wantHash)) =>
    test(s"golden: $name output is frozen (rows + content hash)") {
      val (n, h) = fingerprint(name)
      if (recordMode) {
        info(s"""RECORD "$name" -> (${n}L, "$h")""")
      } else {
        assert(n == wantRows && h == wantHash,
          s"$name drifted: got ($n, $h), frozen ($wantRows, $wantHash) — " +
            "if the 'golden input' tests PASS, this is a real hash-family " +
            "behavior change (fix it, or re-record if intentional); if " +
            "they FAIL, the testdata was regenerated — re-record both maps.")
      }
    }
  }
}
