package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WordPiece tokenization of one word —
  * greedy LONGEST-MATCH-FIRST against a fixed piece vocabulary (the
  * MaxMatch algorithm of BERT's tokenizer; Wu et al. 2016 §4.1
  * introduced the wordpiece model, Song et al. 2021 "Fast WordPiece
  * Tokenization" names this exact greedy as the reference semantics).
  * At each position the longest vocabulary piece that prefixes the
  * remainder is emitted and consumed; if NO piece matches (not even a
  * single character) the whole word degrades to `[UNK]` — the BERT
  * rule. No `##` continuation marking: the vocabulary here is the
  * trained BPE piece set + alphabet (q195), which has a single
  * namespace.
  *
  * Same plan-carried-side-data design as [[BpeEncode]]: the vocabulary
  * (driver-sized — pieces are one per learned merge plus the alphabet)
  * rides the generated class's references array as a hash set + max
  * piece length; per-word cost is O(|word| · maxPieceLen) hash probes,
  * inside whole-stage codegen. Symbols are CODE POINTS (what the
  * oracle's `substr` counts), not UTF-16 units. */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
    }

  @transient private lazy val table: WordPieceVocab = WordPieceVocab(vocab)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceEncode.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // top-level class — the type name is spliced into generated Java
    val vocabRef = ctx.addReferenceObj("wpVocab", table,
      "graft.functions.WordPieceVocab")
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.WordPieceEncode$$.MODULE$$.compute($w, $vocabRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceEncode = copy(child = newChild)
}

/** The piece vocabulary in probe form: hash set + max piece length in
  * CODE POINTS ([[WordPieceEncode]]'s plan-carried side data). */
final case class WordPieceVocab(vocab: Seq[String]) {
  val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  val maxLen: Int =
    if (vocab.isEmpty) 0
    else vocab.iterator.map(p => p.codePointCount(0, p.length)).max
}

object WordPieceEncode {

  val Unk = "[UNK]"

  /** Shared by interpreted eval and generated code: the greedy
    * longest-match walk over one word's code points. */
  def compute(word: UTF8String, v: WordPieceVocab): UTF8String = {
    val w = word.toString
    // code-point index -> UTF-16 offset, so candidate substrings take
    // whole code points (the oracle's substr unit)
    val n = w.codePointCount(0, w.length)
    val off = new Array[Int](n + 1)
    var ci = 0
    var si = 0
    while (si < n) {
      off(si) = ci
      ci += Character.charCount(w.codePointAt(ci))
      si += 1
    }
    off(n) = w.length
    val out = new java.lang.StringBuilder(w.length * 2)
    var i = 0
    var first = true
    while (i < n) {
      var l = math.min(v.maxLen, n - i)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = w.substring(off(i), off(i + l))
        if (v.set.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) return UTF8String.fromString(Unk) // BERT's whole-word rule
      if (!first) out.append(' ')
      out.append(hit)
      first = false
      i += l
    }
    UTF8String.fromString(out.toString)
  }

  def wordpieceEncode(word: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WordPieceEncode(org.apache.spark.sql.graft.Bridge.expression(word), vocab))
}
