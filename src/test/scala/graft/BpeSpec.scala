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

  test("encodeWords == encodeByFold bit-for-bit on adversarial words") {
    // the broadcast one-pass encoder must equal the merge-at-a-time
    // run-parity fold on every hazard: overlapping runs ("aaaa"),
    // odd-length runs, cross-round cascades ((a,a) then (aa,aa)),
    // merged-product re-matches ((a,b) then (ab,ab)), conflicting
    // orders ((a,b) vs (b,a)), words with no match, non-BMP code
    // points (substr counts code points, not UTF-16 units), and the
    // EMPTY word — both encoders drop it (charSymbols yields no symbol
    // rows; encodeWords filters it explicitly — ADVICE r15 #3)
    val words = Seq("aaaa", "aaa", "aaaaaa", "abab", "aba", "xyz", "xab",
      "abcabc", "banana", "aabbaabb", "ababab", "zz", "a😀b", "")
      .toDF("w")
    val merges = Seq(("a", "a"), ("aa", "aa"), ("a", "b"), ("ab", "ab"),
      ("b", "a"), ("a", "😀"))
    val fast = Bpe.encodeWords(words, merges)
      .as[(String, String)].collect().toMap
    val fold = Bpe.encodeByFold(words, merges)
      .as[(String, String)].collect().toMap
    assert(fast == fold)
  }

  test("WordPiece greedy longest-match: longest wins, [UNK] on any unmatched char, code-point candidates") {
    import graft.functions.WordPieceEncode.wordpieceEncode
    val vocab = Seq("a", "b", "c", "ab", "abc", "bc", "😀")
    val words = Seq(
      "abcabc", // longest-first: "abc abc", never "ab c ab c"
      "abab",   // "ab ab"
      "acb",    // "a c b" — singles when no longer piece prefixes
      "abca",   // "abc a"
      "aزb",    // 'ز' not in vocab → whole word [UNK] (BERT rule)
      "a😀b",   // non-BMP piece matches as ONE code point
      "bca"     // "bc a" — longest at pos 0 is bc, not b
    ).toDF("w")
    val got = words.select(col("w"), wordpieceEncode(col("w"), vocab).as("p"))
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "abcabc" -> "abc abc", "abab" -> "ab ab", "acb" -> "a c b",
      "abca" -> "abc a", "aزb" -> "[UNK]", "a😀b" -> "a 😀 b",
      "bca" -> "bc a"))
  }

  test("wordpieceHeldOut: every piece is a vocab member, concatenation restores the word, no [UNK] on the covered corpus") {
    val docs = Tables.documents(spark, sf)
    val vocab = Bpe.wordpieceVocab(docs, 3).toSet
    val rows = Bpe.wordpieceHeldOut(docs, 3)
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, wp) =>
      assert(wp != "[UNK]", s"$w degraded to UNK under a covering vocab")
      val pieces = wp.split(" ")
      pieces.foreach(p => assert(vocab.contains(p), s"$w emitted non-vocab piece $p"))
      assert(pieces.mkString == w, s"$w pieces do not tile the word: $wp")
      // greedy longest-match property at position 0: no longer vocab
      // piece can prefix the word than the one taken
      val first = pieces.head
      (first.length + 1 to w.length).foreach { l =>
        assert(!vocab.contains(w.substring(0, l)),
          s"$w: greedy took $first but ${w.substring(0, l)} is in vocab")
      }
    }
  }

  test("selectBatch stays exact when the conflict tail exceeds the cap window") {
    // 5000 candidates all sharing 'a': greedy accepts exactly one; the
    // capped scan stops at SelectCap rows but the accepted set is the
    // same (later candidates all conflict), and nothing crashes
    val stats = (0 until 5000)
      .map(i => ("a", f"t$i%05d", 1L)).toDF("sym", "nxt", "cnt")
    assert(Bpe.selectBatch(stats, 4) == Seq(("a", "t00000", 1L)))
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

  // ---- q170 batched non-conflicting merges ----

  private def collectSyms(df: org.apache.spark.sql.DataFrame) =
    df.select("w", "pos", "sym").as[(String, Long, String)]
      .collect().toSet

  test("applyMergeBatch == sequential applyMerge, in either order") {
    val syms = Bpe.charSymbols(
      Seq(("abcd", 2L), ("xyab", 1L), ("cdxy", 3L))
        .toDF("w", "wcnt"))
    val batch = Seq(("a", "b"), ("c", "d"), ("x", "y"))
    val batched = collectSyms(Bpe.applyMergeBatch(syms, batch))
    val seq1 = collectSyms(batch.foldLeft(syms) { case (s, (l, r)) =>
      Bpe.applyMerge(s, l, r) })
    val seq2 = collectSyms(batch.reverse.foldLeft(syms) { case (s, (l, r)) =>
      Bpe.applyMerge(s, l, r) })
    assert(batched == seq1 && batched == seq2,
      "disjoint merges must commute and equal the one-pass batch")
    // same-pair runs keep the greedy parity in the batch path too
    val run = Bpe.applyMergeBatch(symsOf("aaaa"), Seq(("a", "a")))
      .orderBy("pos").select("sym").as[String].collect().toList
    assert(run == List("aa", "aa"))
  }

  test("selectBatch skips pairs sharing a symbol or a merged product") {
    val stats = Seq(("a", "b", 10L), ("ab", "c", 9L), ("b", "x", 8L),
      ("x", "y", 7L), ("y", "z", 6L))
      .toDF("sym", "nxt", "cnt")
    // (a,b) accepted → blocks (ab,c) via the PRODUCT "ab" and (b,x)
    // via the shared "b"; (x,y) accepted → blocks (y,z) via "y".
    assert(Bpe.selectBatch(stats, 4) ==
      Seq(("a", "b", 10L), ("x", "y", 7L)))
  }

  test("selectBatch survives a conflict tail longer than the first collect") {
    // 70 candidate pairs all sharing the symbol 'a': greedy accepts
    // exactly one, and must page past the first 64-row collect to
    // prove no later candidate is disjoint.
    val chars = (33 to 122).map(_.toChar).filter(_ != 'a').take(70)
    val stats = chars.map(c => ("a", c.toString, 1L))
      .toDF("sym", "nxt", "cnt")
    val got = Bpe.selectBatch(stats, 4)
    assert(got == Seq(("a", chars.map(_.toString).min, 1L)))
  }

  test("trainMergesBatched learns the hand-computed batches") {
    // "low"x3 + "lower": r1 pairs (l,o)=4,(o,w)=4,(e,r)=1,(w,e)=1.
    // Greedy: (l,o) in; (o,w) shares o; (e,r) in; (w,e) shares e.
    // r2: (lo,w)=4 in; (w,er)=1 shares w. r3: (low,er)=1 in.
    val docs = corpus("low low low lower")
    val got = Bpe.trainMergesBatched(docs, 3, 4)
      .orderBy("rnd", "lhs")
      .select("rnd", "lhs", "rhs", "merged", "cnt")
      .as[(Int, String, String, String, Long)].collect().toList
    assert(got == List(
      (1, "e", "r", "er", 1L),
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "low", "er", "lower", 1L)))
  }

  test("trainMergesBatched stops early on an exhausted vocabulary") {
    assert(Bpe.trainMergesBatched(corpus("a b c a"), 5, 4).count() == 0)
  }

  test("fertility weights piece counts by held-out OCCURRENCES per source") {
    // merges learned on docs 1-2: (a,b) then (c,d). Held-out doc 10
    // (source sA): abab→2 pieces, cd→1, zz→2; doc 20 (source sB)
    // repeats cd twice — occurrence-weighted, not vocab-weighted.
    val docs = Seq(
      (1L, "ab ab", "sA"), (2L, "ab cd", "sA"),
      (10L, "abab cd zz", "sA"), (20L, "cd cd", "sB"))
      .toDF("doc_id", "text", "source")
    val got = Bpe.fertilityBySource(docs, 2)
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, a, b, c) => s -> ((a, b, c)) }.toMap
    assert(got == Map(
      "sA" -> ((3L, 5L, 8L)),   // abab(2p,4c) cd(1p,2c) zz(2p,2c)
      "sB" -> ((2L, 2L, 4L)))) // cd twice: 2 words, 2 pieces, 4 chars
  }
}
