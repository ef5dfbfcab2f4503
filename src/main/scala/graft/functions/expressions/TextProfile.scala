package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-profile kernel: token counts, punctuation ratio, mean word
  * length, stopword language-ID, and md5 fingerprint in ONE pass over the
  * document.
  *
  * Why native: the builtin formulation is a forest of higher-order
  * functions — `langId` alone holds five copies of the tokenize subtree
  * (one per language filter), `meanWordLength` an interpreted `aggregate`
  * lambda per token — none of which codegen. Field semantics (including
  * each field's null contract for null text) are bit-identical to the
  * [[graft.operators.TextAnalysis]] builtin twins and the DuckDB oracles:
  *   - n_tokens_ws / n_tokens_bpe: null text → null
  *   - punct_ratio / mean_word_len: null text → 0.0
  *   - lang_pred: null text → "und"
  *   - fingerprint (md5 of canonical text): null text → null
  *   - n_chars / punct_count / sum_word_len: null text → 0
  *
  * The struct itself is never null, so consumers project fields without an
  * outer null branch; whole-stage codegen CSEs the single kernel call across
  * multiple field references.
  */
case class TextProfile(child: Expression,
    profiles: Seq[(String, Seq[String])] = TextProfile.DefaultProfiles)
    extends UnaryExpression {

  override def dataType: DataType = TextProfile.Schema
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_profile expects string, got ${other.simpleString}")
  }

  @transient private lazy val langs: Array[String] =
    profiles.map(_._1).sorted.toArray

  @transient private lazy val stopSets: Array[java.util.HashSet[String]] = {
    val m = profiles.toMap
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      m(l).foreach(w => s.add(w.toLowerCase))
      s
    }
  }

  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val langsUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  /** The full kernel; public because generated code calls it. */
  def kernel(text: UTF8String): InternalRow = {
    if (text == null)
      return new GenericInternalRow(
        Array[Any](null, null, 0.0, 0.0, und, null, 0, 0, 0L))
    val s = text.toString
    val trimmed = TextProfile.stripSpaces(s)
    val wsTokens = TextProfile.wsPattern.split(trimmed, -1)
    val nWs = wsTokens.length
    val nBpe = TextProfile.countMatches(TextProfile.bpePattern, s)
    val nChars = s.codePointCount(0, s.length)
    val punctCnt = TextProfile.countMatches(TextProfile.punctPattern, s)
    val punct = if (nChars == 0) 0.0 else punctCnt.toDouble / nChars
    var sumLen = 0L
    var i = 0
    while (i < nWs) { sumLen += wsTokens(i).codePointCount(0, wsTokens(i).length); i += 1 }
    val mwl = if (nWs == 0) 0.0 else sumLen.toDouble / nWs
    // language id over lowercased tokens — derived from the ALREADY-split
    // tokens (no Unicode character lowercases to whitespace, so boundaries
    // are identical); re-splitting a second lowered copy doubled the
    // regex work per document
    val lowTokens = new Array[String](nWs)
    var k = 0
    while (k < nWs) { lowTokens(k) = wsTokens(k).toLowerCase; k += 1 }
    var bestLang = und
    var bestHits = 0
    var li = 0
    while (li < langs.length) {
      var hits = 0
      var ti = 0
      while (ti < lowTokens.length) {
        if (stopSets(li).contains(lowTokens(ti))) hits += 1
        ti += 1
      }
      // strict > keeps the lexicographically-first language on ties
      if (hits > bestHits) { bestHits = hits; bestLang = langsUtf8(li) }
      li += 1
    }
    val fp = UTF8String.fromString(TextProfile.md5Hex(Kernels.canonical(text)))
    new GenericInternalRow(
      Array[Any](nWs, nBpe, punct, mwl, bestLang, fp, nChars, punctCnt, sumLen))
  }

  override def eval(input: InternalRow): Any =
    kernel(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("textProfile", this,
      classOf[TextProfile].getName)
    ev.copy(
      code = code"""
        |${c.code}
        |InternalRow ${ev.value} = $ref.kernel(${c.isNull} ? null : ${c.value});
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfile {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens_ws", IntegerType, nullable = true),
    StructField("n_tokens_bpe", IntegerType, nullable = true),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("fingerprint", StringType, nullable = true),
    // raw integer tallies (null text → 0): the exactly-comparable inputs
    // the integer-decis quality gate derives from — no float ever needs to
    // enter a differential hash when consumers compare these cross-wise
    StructField("n_chars", IntegerType, nullable = false),
    StructField("punct_count", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false)))

  /** Mirrors [[graft.operators.TextAnalysis.StopwordProfiles]]. */
  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  private[expressions] val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private[expressions] val bpePattern =
    java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
  private[expressions] val punctPattern =
    java.util.regex.Pattern.compile("[!-/:-@\\[-`{-~]")

  private[expressions] def countMatches(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** `functions.trim` strips only the space character — mirror exactly. */
  private[expressions] def stripSpaces(s: String): String = {
    var from = 0; var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private[expressions] def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
