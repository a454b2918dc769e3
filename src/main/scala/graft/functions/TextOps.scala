package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (dedup,
  * quality, language-ID, fingerprinting). All built from codegen'd
  * built-ins — `split`/`transform`/`filter`/`regexp_count` — so a 100 TB
  * documents scan stays inside WholeStageCodegen with no UDF boundary.
  */
object TextOps {

  /** Whitespace tokens (the reference corpus is single-space normalized). */
  def words(text: Column): Column = split(text, " ")

  def distinctWords(text: Column): Column = array_distinct(words(text))

  /** Word n-gram shingles: ["a","b","c"] with n=2 → ["a b","b c"].
    * Native `NGramStrings` expression — the original HOF form
    * (`transform(sequence, concat_ws(element_at ...))`) broke whole-stage
    * codegen and re-walked the words array per element; measured ~2.5s of
    * q81's ~3s at sf0.1. */
  def shingles(text: Column, n: Int): Column =
    NGramStrings.ngramStrings(words(text), n)

  /** Count of tokens under a BPE-ish regex (letter runs / digit runs /
    * single other symbol) — the "token counting" analogue when no real
    * tokenizer is available. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))

  /** How many of the doc's words appear in `vocab`. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(vocab)))

  /** Canonical bag-of-words form: sorted distinct words re-joined — the
    * normalization step under content-defined fingerprinting. */
  def canonicalForm(text: Column): Column =
    array_join(array_sort(distinctWords(text)), " ")

  /** MinHash signature (length k) over the doc's `n`-gram shingles.
    * Delegates to the native [[MinHashSig]] Catalyst expression — the
    * higher-order-function formulation (k nested interpreted lambdas per
    * element) measured ~60× slower at k=96. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val units = if (n == 1) distinctWords(text) else array_distinct(shingles(text, n))
    MinHashSig.minhashSig(units, k)
  }

  /** LSH band keys: the signature split into `bands` groups of `rowsPer`
    * hashes; docs sharing any band key are candidate duplicates. Unrolled
    * as a literal array (not a `transform` lambda — HOFs evaluate
    * interpreted) and hashed NUMERICALLY: xxhash64 hashes the band index
    * and the long-array slice together into ONE long — a flat 8-byte join
    * key instead of a nested struct, so the candidate shuffle hashes and
    * compares a primitive. (A cross-band hash collision just adds a false
    * candidate; the exact-verify stage filters it.) */
  def lshBands(sig: Column, bands: Int, rowsPer: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(sig, b * rowsPer + 1, rowsPer))
    }: _*)

  /** 64-bit SimHash over words (term-frequency weighted ±1 bit votes).
    * Delegates to the native [[SimHash64]] expression — the HOF fold
    * rendition capped practical width at 16 bits. */
  def simhash(text: Column): Column = SimHash64.simhash64(words(text))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
