package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Properties of the distributed BPE trainer (q149): greedy left-to-right
  * non-overlap merge application (the run-parity window), deterministic
  * tie-breaking, hand-computed merge tables, and graceful exhaustion. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) = texts.toDF("text")

  private def symsOf(word: String) =
    Bpe.charSymbols(corpus(word).select(col("text").as("w"), lit(1L).as("wcnt"))
      .groupBy("w").agg(sum("wcnt").as("wcnt")))

  private def applied(word: String, lhs: String, rhs: String): List[String] =
    Bpe.applyMerge(symsOf(word), lhs, rhs)
      .orderBy("pos").select("sym").as[String].collect().toList

  test("applyMerge is greedy left-to-right: overlapping runs merge at even offsets") {
    // "aaaa" + (a,a): greedy takes (0,1) and (2,3), never the overlapping (1,2)
    assert(applied("aaaa", "a", "a") == List("aa", "aa"))
    // odd run length leaves the tail symbol unmerged
    assert(applied("aaa", "a", "a") == List("aa", "a"))
    assert(applied("aaaaa", "a", "a") == List("aa", "aa", "a"))
  }

  test("applyMerge handles disjoint matches and no-matches") {
    assert(applied("abab", "a", "b") == List("ab", "ab"))
    assert(applied("aba", "b", "a") == List("a", "ba"))
    assert(applied("xyz", "a", "b") == List("x", "y", "z"))
    // match at word end
    assert(applied("xab", "a", "b") == List("x", "ab"))
  }

  test("trainMerges learns the hand-computed table on a tiny corpus") {
    // "low" x3, "lower" x1: pair counts r1: (l,o)=4 (o,w)=4 (w,e)=1 (e,r)=1
    // → tie (l,o) vs (o,w) broken lexicographically → (l,o).
    // r2: lo+w=4 (w,e)=1 (e,r)=1 → (lo,w). r3: (low,e)=1 (e,r)=1 → (e,r)? no:
    // tie broken lex → ("e","r") vs ("low","e"): count both 1, lhs "e" < "low"
    // → (e,r).
    val docs = corpus("low low low lower")
    val got = Bpe.trainMerges(docs, 3)
      .orderBy("rnd")
      .select("rnd", "lhs", "rhs", "merged", "cnt")
      .as[(Int, String, String, String, Long)].collect().toList
    assert(got == List(
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "e", "r", "er", 1L)))
  }

  test("trainMerges stops early when the vocabulary is exhausted") {
    // single-char words: no adjacent pairs at all → empty table, no crash
    assert(Bpe.trainMerges(corpus("a b c a"), 5).count() == 0)
    // one two-char word: exactly one merge possible
    val one = Bpe.trainMerges(corpus("ab ab"), 5)
      .select("merged").as[String].collect().toList
    assert(one == List("ab"))
  }

  test("merge counts are weighted by corpus word frequency, not distinct words") {
    // "ab" appears 3x, "cd" once → (a,b) count 3 beats (c,d) count 1
    val got = Bpe.trainMerges(corpus("ab ab ab cd"), 1)
      .select("lhs", "rhs", "cnt").as[(String, String, Long)].head()
    assert(got == ("a", "b", 3L))
  }

  test("encodeHeldOut applies the trained merges in order to the held-out vocabulary") {
    // train on docs 1-2: round 1 learns (a,b)→"ab" (count 3), round 2
    // learns (c,d)→"cd". Held-out doc 10's vocabulary encodes with
    // BOTH merges in order; "zz" has no applicable merge and stays
    // character-split. One row per DISTINCT held-out word.
    val docs = Seq((1L, "ab ab"), (2L, "ab cd"), (10L, "abab cd zz"))
      .toDF("doc_id", "text")
    val got = Bpe.encodeHeldOut(docs, 2)
      .as[(String, String)].collect().toMap
    assert(got == Map("abab" -> "ab ab", "cd" -> "cd", "zz" -> "z z"))
  }
}
