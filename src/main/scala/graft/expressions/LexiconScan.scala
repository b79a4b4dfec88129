package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass stopword-lexicon counter for language ID — replaces four
  * `regexp_count(lower(text), '\b(w1|…|w8)\b')` passes with one scan of
  * the UTF-8 bytes.
  *
  * Equivalence contract with the regexes (asserted in LexiconScanSpec):
  * every lexicon word is ASCII letters only, and a `\b…\b`-delimited
  * match is exactly a MAXIMAL word-char run equal to a lexicon word.
  * Java's `\b` is UNICODE-aware even though its `\w` is ASCII
  * (JDK-8264160): a letter like é extends the word run. This scanner
  * therefore treats [a-zA-Z0-9_] AND every byte with the high bit set
  * (any multi-byte UTF-8 unit) as word characters. That over-approximates
  * Java for non-letter symbols (e.g. '⊕' adjacent to a stopword) — the
  * engine's corpora are ASCII where the two agree exactly.
  *
  * Result: packed long `de<<48 | fr<<32 | es<<16 | en`, each count
  * saturating at 0xffff (a 65k-repeats-of-one-stopword document would
  * clamp — irrelevant for ranking real text).
  */
object LexiconScan {

  /** Single source of truth — TrainingDataOps builds its oracle regexes
    * from these lists.
    */
  val lexiconWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "no", "como"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"))

  // words flattened to byte arrays with their lexicon index, grouped by
  // length for cheap per-token candidate lookup (max word length 5)
  private val maxLen = lexiconWords.flatMap(_._2).map(_.length).max
  private val byLen: Array[Array[(Array[Byte], Int)]] = {
    val groups = Array.fill(maxLen + 1)(List.empty[(Array[Byte], Int)])
    for (((_, words), li) <- lexiconWords.zipWithIndex; w <- words) {
      val b = w.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      groups(b.length) = (b, li) :: groups(b.length)
    }
    groups.map(_.toArray)
  }

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_' || b < 0

  def count(s: UTF8String): Long = {
    val n = s.numBytes()
    val counts = new Array[Int](4)
    var i = 0
    while (i < n) {
      if (!isWord(s.getByte(i))) i += 1
      else {
        val start = i
        while (i < n && isWord(s.getByte(i))) i += 1
        val len = i - start
        if (len <= maxLen) {
          val cands = byLen(len)
          var c = 0
          while (c < cands.length) {
            val (w, li) = cands(c)
            var k = 0
            while (k < len && s.getByte(start + k) == w(k)) k += 1
            if (k == len && counts(li) < 0xffff) counts(li) += 1
            c += 1
          }
        }
      }
    }
    (counts(0).toLong << 48) | (counts(1).toLong << 32) |
      (counts(2).toLong << 16) | counts(3).toLong
  }
}

case class LexiconCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lexicon_counts requires a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    LexiconScan.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.LexiconScan.count($c)")
  override protected def withNewChildInternal(newChild: Expression): LexiconCounts =
    copy(child = newChild)
  override def prettyName: String = "lexicon_counts"
}

object LexiconFunctions {
  def lexiconCounts(c: Column): Column =
    CatalystBridge.column(LexiconCounts(CatalystBridge.expression(c)))
}
