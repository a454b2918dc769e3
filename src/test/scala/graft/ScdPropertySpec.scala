package graft

import graft.warehouse.{Scd, ScdSpec}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based SCD invariants over generated batches (SURVEY.md §5.3):
  * whatever the batch contents — duplicate BKs, overlapping keys, attr
  * churn — the merge must keep ≤1 current row per BK, version every SCD2
  * change, and be idempotent under replay. */
class ScdPropertySpec extends SparkSpec {
  import spark.implicits._

  private val spec = ScdSpec("bk", scd2 = Seq("name"), scd1 = Seq("score"))

  // rows as tuples: inner case classes have no stable outer scope for
  // Spark's encoder
  private val rowGen: Gen[(Long, String, String)] = for {
    bk <- Gen.chooseNum(0L, 15L)
    name <- Gen.oneOf("alpha", "beta", "gamma")
    score <- Gen.oneOf("1", "2", "3")
  } yield (bk, name, score)

  private val batchGen: Gen[List[(Long, String, String)]] = Gen.listOfN(30, rowGen)

  // no scalatest/scalacheck bridge in the offline deps: drive the
  // generators directly with fixed seeds (deterministic cases)
  private def sample(seed: Long): List[(Long, String, String)] =
    batchGen(Gen.Parameters.default, Seed(seed)).get

  test("property: merge keeps <=1 current row per BK and versions every SCD2 change") {
    for (seed <- 1L to 8L) {
      val b1 = sample(seed)
      val b2 = sample(seed + 100)
      val dim0 = Scd.initialLoad(b1.toDF("bk", "name", "score"), spec, "2024-01-01")
      val merged = Scd.merge(dim0, b2.toDF("bk", "name", "score"), spec, "2024-02-01").cache()
      withClue(s"seed=$seed") {
        // <=1 current row per BK
        assert(merged.filter($"is_current").groupBy("bk").count()
          .filter($"count" > 1).count() == 0)
        // every expired row has end_date; every current row has none
        assert(merged.filter(!$"is_current" && $"end_date".isNull).count() == 0)
        assert(merged.filter($"is_current" && $"end_date".isNotNull).count() == 0)
        // SKs unique
        assert(merged.select("sk").distinct().count() == merged.count())
        // replaying b2 is a no-op
        val again = Scd.merge(merged, b2.toDF("bk", "name", "score"), spec, "2024-03-01")
        assert(again.count() == merged.count())
      }
      merged.unpersist()
    }
  }

  test("property: within-batch dedup is order-insensitive") {
    for (seed <- 1L to 8L) {
      val b = sample(seed)
      val a = Scd.dedup(b.toDF("bk", "name", "score"), spec).orderBy("bk").collect()
      val shuffled = new scala.util.Random(seed).shuffle(b)
      val c = Scd.dedup(shuffled.toDF("bk", "name", "score").repartition(5), spec)
        .orderBy("bk").collect()
      withClue(s"seed=$seed") { assert(a.sameElements(c)) }
    }
  }
}
