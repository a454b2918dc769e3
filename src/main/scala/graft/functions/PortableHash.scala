package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-replayable hash primitives for the sketch family
  * ([[MinHashSig]], [[SimHash64]]).
  *
  * Earlier rounds keyed both sketches on Spark's `XxHash64Function`,
  * which no other engine can replay — so q56/q57/q65 could only be
  * golden-pinned, a weaker guarantee than the DuckDB hash-compare every
  * other catalog query gets. The family here is chosen so the ENTIRE
  * signature computation is expressible in portable ANSI-ish SQL:
  *
  *  - base hash: the first/second 15 hex chars of `md5(token)` parsed as
  *    a 60-bit integer. md5 is bit-identical across engines (the CDC
  *    dedup family q101/q102 already leans on this), and a 15-hex-char
  *    prefix always fits a signed 64-bit int — DuckDB replays it as a
  *    15-term positional `strpos` polynomial over the hex string.
  *  - permutation family: affine transforms `(a·h + b) mod (2^61 − 1)`
  *    over the Mersenne prime — a standard universal family. The modulus
  *    is the point: products reach 2^121, which Java does exactly via
  *    `Math.multiplyHigh` + the 2^61 ≡ 1 folding identity, and DuckDB
  *    does exactly via HUGEINT (128-bit) arithmetic. Wraparound 64-bit
  *    multiplication (the previous family) is NOT portable — DuckDB
  *    raises on BIGINT overflow rather than wrapping.
  *
  * All values live in [0, 2^61), so min-comparison is plain signed
  * comparison in both engines. Constants derive from a fixed SplitMix64
  * stream and are embedded as literals in both the Catalyst expression
  * and the generated oracle SQL (see [[affineConstsValuesSql]]).
  */
object PortableHash {

  /** Mersenne prime 2^61 − 1: modulus of the affine permutation family. */
  val P61: Long = (1L << 61) - 1

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** md5 digest of the token's UTF-8 bytes; null tokens digest as the
    * empty string (a fixed, portable rule — SQL replay never sees nulls
    * because `string_split` cannot produce them). */
  def md5Of(u: UTF8String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(if (u == null) Array.emptyByteArray else u.getBytes)
  }

  /** Hex chars 1–15 of the digest as a 60-bit int:
    * bytes 0–6 big-endian, then the high nibble of byte 7. */
  def hi60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Hex chars 16–30 of the digest as a 60-bit int:
    * the low nibble of byte 7, then bytes 8–14 big-endian. */
  def lo60(d: Array[Byte]): Long = {
    var v = d(7) & 0x0fL
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Primary 60-bit base hash of a token (hex chars 1–15 of its md5). */
  def base60(u: UTF8String): Long = hi60(md5Of(u))

  /** `(a·h + b) mod (2^61 − 1)`, exact for a, b ∈ [0, P61), h ∈ [0, 2^60).
    * The 128-bit product folds via 2^61 ≡ 1 (mod P61): with
    * x = hi·2^64 + lo, x mod P = (x & P) + (x >> 61) reduced once —
    * both addends < 2^61, so the sum never overflows a signed long. */
  def affine61(a: Long, h: Long, b: Long): Long = {
    val lo = a * h
    val hi = Math.multiplyHigh(a, h)
    var s = (lo & P61) + (((lo >>> 61) | (hi << 3)) & P61)
    if (s >= P61) s -= P61
    s += b
    if (s >= P61) s -= P61
    s
  }

  /** Deterministic affine constants (SplitMix64 stream): a ∈ [1, P61),
    * b ∈ [0, P61). Pure function of k — the same values are embedded as
    * SQL literals by [[affineConstsValuesSql]]. */
  def consts61(k: Int): (Array[Long], Array[Long]) = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a = Array.fill(k) { val v = (next() >>> 3) % P61; if (v == 0L) 1L else v }
    val b = Array.fill(k)((next() >>> 3) % P61)
    (a, b)
  }

  // ---- DuckDB oracle SQL builders (the replay side of the contract) ----

  private def hexPolySql(m: String, from: Int, to: Int): String =
    (from to to).map { i =>
      s"(strpos('0123456789abcdef', substr($m, $i, 1)) - 1) * ${BigInt(16).pow(to - i)}"
    }.mkString(" + ")

  /** SQL computing [[hi60]] ∘ md5-hex from a 32-char md5 hex column. */
  def hi60Sql(m: String): String = hexPolySql(m, 1, 15)

  /** SQL computing [[lo60]] ∘ md5-hex from a 32-char md5 hex column. */
  def lo60Sql(m: String): String = hexPolySql(m, 16, 30)

  /** SQL computing [[affine61]] exactly via HUGEINT intermediates. */
  def affine61Sql(a: String, h: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) * $h + $b) % $P61 AS BIGINT)"

  /** `(j, a, b)` VALUES rows for the k-permutation family — join against
    * the per-token base hash and group-min to replay [[MinHashSig]]. */
  def affineConstsValuesSql(k: Int): String = {
    val (a, b) = consts61(k)
    (0 until k).map(j => s"(${j}, ${a(j)}, ${b(j)})").mkString(", ")
  }
}
