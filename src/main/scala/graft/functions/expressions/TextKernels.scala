package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-dedup kernels (SURVEY §4.2 item 4 — post-parity custom
  * expressions justified by benchmarks).
  *
  * Why native: the builtin formulations of shingling and MinHash are chains
  * of higher-order functions (`transform`/`filter`/`aggregate`), which are
  * CodegenFallback in Spark — every element pays an interpreted-lambda
  * round-trip, and because `minhashSignature` referenced the shingle subtree
  * from each of its `numHashes` branches, Catalyst duplicated the whole
  * canonicalize→shingle→md5 pipeline per hash (measured 50 s for 12 hashes
  * over 273 k shingles at sf0.1 vs 4 s for one pass). These kernels do one
  * pass per document and stay inside whole-stage codegen.
  *
  * Differential-test contract: outputs are bit-identical to the builtin
  * twins they replace ([[graft.operators.Dedup.shinglesBuiltin]],
  * [[graft.operators.Dedup.minhashSignatureOfHashes]],
  * [[graft.operators.Dedup.simhashTokenHashesBuiltin]]) and to the DuckDB
  * oracle SQL, which mirrors the same md5-hex arithmetic.
  */
object Kernels {

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  val MinhashP = 1000000007L

  /** Affine permutation parameters (a_i odd < 2^28, b_i < 2^28) — md5-seeded,
    * identical to the published construction in the DuckDB oracles.
    */
  def affineParams(i: Int): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h7(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 7), 16)
    (h7(s"minhash-a-$i") | 1L, h7(s"minhash-b-$i"))
  }

  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def affineTable(numHashes: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(numHashes, n => {
      val as = new Array[Long](n); val bs = new Array[Long](n)
      var i = 0
      while (i < n) { val (a, b) = affineParams(i); as(i) = a; bs(i) = b; i += 1 }
      (as, bs)
    })

  /** Canonical text: lowercase, collapse whitespace runs to one space, strip
    * leading/trailing spaces — char-identical to
    * `trim(regexp_replace(lower(text), "\\s+", " "))` (Spark `trim` strips
    * only the space character, so we do too).
    */
  def canonical(text: UTF8String): String = {
    val collapsed = wsPattern.matcher(text.toLowerCase.toString).replaceAll(" ")
    var from = 0; var to = collapsed.length
    while (from < to && collapsed.charAt(from) == ' ') from += 1
    while (to > from && collapsed.charAt(to - 1) == ' ') to -= 1
    collapsed.substring(from, to)
  }

  /** Distinct word n-gram shingles in first-occurrence order. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = canonical(text).split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= tokens.length) {
      val sb = new java.lang.StringBuilder(tokens(i))
      var j = 1
      while (j < n) { sb.append(' ').append(tokens(i + j)); j += 1 }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  /** First 4 md5 bytes of a UTF-8 string as an unsigned 32-bit value in a
    * long — identical to `conv(substring(md5(s), 1, 8), 16, 10)`.
    */
  def md5Head32(s: UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 60 bits (15 hex digits) of md5 as a long — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`.
    */
  def md5Head60(s: UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash signature over a shingle array: for permutation i,
    * `min_s (md5Head32(s) * a_i + b_i) mod P`. Null shingles are skipped;
    * no usable shingle → all-null signature (mirrors `array_min`'s
    * null-on-empty).
    */
  def minHashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val (as, bs) = affineTable(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        any = true
        val h = md5Head32(shingles.getUTF8String(j))
        var i = 0
        while (i < numHashes) {
          val v = (h * as(i) + bs(i)) % MinhashP
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numHashes)) // all nulls
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Tokens of the canonical text in order, empty tokens excluded — one
    * fused pass, char-identical to
    * `filter(split(canonical(text), " "), t => length(t) > 0)`.
    */
  def canonicalTokens(text: UTF8String): ArrayData = {
    val canon = canonical(text)
    if (canon.isEmpty) return new GenericArrayData(Array.empty[Any])
    // canonical() collapsed runs and trimmed ends, so every token is nonempty
    val tokens = canon.split(" ", -1)
    val out = new Array[Any](tokens.length)
    var i = 0
    while (i < tokens.length) { out(i) = UTF8String.fromString(tokens(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Anchor `(off, md5)` pairs of every k-codepoint gram whose md5 hex
    * starts with `prefix` — the substring-dedup front end
    * ([[graft.operators.Dedup.substringDupSpans]]) in ONE pass over the
    * UTF-8 bytes: the digest is reused across grams and fed a byte SLICE
    * of the text (`update(bytes, from, len)`), so a gram costs exactly one
    * md5 block computation — no substring copy, no hex-string encoding,
    * no per-offset row. The builtin formulation
    * (`explode(sequence(...))` + `md5(substr(...))` + `startsWith`) pays a
    * k-char substring allocation, a 32-char hex encoding, and a generated
    * ROW per gram, of which ~15/16 are then filtered away; fusing removes
    * all three, and only anchor rows ever reach the downstream explode.
    *
    * Exactness: `substr` indexes by codepoint, and the UTF-8 encoding of a
    * codepoint substring IS the corresponding byte slice, so hashing the
    * slice is bit-identical to hashing the substring's `getBytes` — the
    * DuckDB oracle's per-gram md5 replay keeps matching.
    *
    * Offsets are 0-based codepoint offsets; `h` is the full 16-byte digest
    * (the downstream grouping key — full width so cross-document marking
    * keeps md5's collision bound at 100 TB corpus scale, where a truncated
    * 64-bit key would birthday-collide and false-mark).
    */
  def gramAnchors(text: UTF8String, k: Int, pNib: Array[Int]): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    val nChars = text.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    // codepoint → byte-offset table, one linear pass
    val starts = new Array[Int](nChars + 1)
    var b = 0; var c = 0
    while (b < nBytes) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    starts(nChars) = nBytes
    // prefix nibbles are parsed ONCE at plan time (GramAnchors.prefixNibbles,
    // shipped via addReferenceObj) — per-row parsing of a plan constant
    // would be pure garbage on a corpus-scale scan
    val pLen = pNib.length
    val md = md5Local.get()
    val buf = new Array[Byte](16)
    val out = new java.util.ArrayList[Any]()
    var off = 0
    while (off + k <= nChars) {
      md.reset()
      md.update(bytes, starts(off), starts(off + k) - starts(off))
      md.digest(buf, 0, 16)
      var ok = true
      var j = 0
      while (ok && j < pLen) {
        val nib = if ((j & 1) == 0) (buf(j >> 1) >> 4) & 0xf else buf(j >> 1) & 0xf
        ok = nib == pNib(j)
        j += 1
      }
      if (ok) {
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](off, java.util.Arrays.copyOf(buf, 16))))
      }
      off += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** PII patterns for corpus scrubbing, ordered (applied first to last —
    * email before phone so an address's digits are already gone when the
    * phone pattern runs). Restricted to the regex subset Java regex and
    * RE2 evaluate identically — no lookaround, no backreferences, explicit
    * character classes — so any engine replays the redaction bit-for-bit.
    * Canonical home is here (the kernel needs them at class-load);
    * [[graft.operators.TextAnalysis.PiiPatterns]] re-exports.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ipv4", """\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b""", "<IP>"),
    ("phone_intl", """\+[0-9]{1,3}[\s\-]?\(?[0-9]{1,4}\)?[\s\-]?[0-9]{2,4}[\s\-]?[0-9]{2,6}""", "<PHONE>"),
    ("phone_paren", """\([0-9]{2,4}\)[\s\-]?[0-9]{2,4}[\s\-]?[0-9]{2,6}""", "<PHONE>"))

  private lazy val piiCompiled: Array[java.util.regex.Pattern] =
    PiiPatterns.map(p => java.util.regex.Pattern.compile(p._2)).toArray
  // tags are literal (no $ or \), quoted anyway so the kernel can never
  // diverge from regexp_replace's literal-tag behavior
  private lazy val piiTags: Array[String] =
    PiiPatterns.map(p => java.util.regex.Matcher.quoteReplacement(p._3)).toArray

  /** Output shape of [[piiScrub]]: the cleaned text plus one staged count
    * per pattern — field names match `piiCounts`' aliases.
    */
  val PiiScrubType: StructType = StructType(
    StructField("clean_text", StringType, nullable = false) +:
      PiiPatterns.map(p => StructField(s"n_${p._1}", IntegerType, nullable = false)))

  /** Fused PII scrub: every pattern's replacement AND its staged hit count
    * in one matcher pass per pattern — 4 passes total where the builtin
    * `redactPii` + `piiCounts` pair costs 8 (4 replaces + 4 counts over
    * progressively rebuilt stage prefixes). Counts are taken on the SAME
    * staged text the replacement consumes (count = number of replacements
    * made), bit-identical to the builtin twins and the DuckDB oracle's
    * staged `regexp_replace`/`regexp_extract_all` replay.
    */
  def piiScrub(text: UTF8String): Any = {
    var s = text.toString
    val n = piiCompiled.length
    val out = new Array[Any](n + 1)
    var i = 0
    while (i < n) {
      val m = piiCompiled(i).matcher(s)
      var cnt = 0
      if (m.find()) {
        val sb = new java.lang.StringBuffer
        do { cnt += 1; m.appendReplacement(sb, piiTags(i)) } while (m.find())
        m.appendTail(sb)
        s = sb.toString
      }
      out(i + 1) = cnt
      i += 1
    }
    out(0) = UTF8String.fromString(s)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Distinct tokens of the canonical text, each hashed to 60 bits — the
    * SimHash front end, one pass.
    */
  def hashedTokens(text: UTF8String): ArrayData = {
    val canon = canonical(text)
    val tokens = canon.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < tokens.length) { seen.add(tokens(i)); i += 1 }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = md5Head60(UTF8String.fromString(it.next())); k += 1 }
    new GenericArrayData(out)
  }
}

private[expressions] trait StringInputCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects string, got ${other.simpleString}")
  }
}

/** Distinct word n-gram shingles of the canonical text (null text → null). */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression with StringInputCheck {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Kernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Kernels.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (array<bigint> of length numHashes) over a shingle
  * array. Null array → null; empty/all-null array → all-null signature.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.minHashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Kernels.minHashSig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered canonical tokens (null text → null, blank text → empty array). */
case class CanonicalTokens(child: Expression)
    extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Kernels.canonicalTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Kernels.canonicalTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Anchor `(off, h)` pairs of the k-codepoint grams whose md5 hex starts
  * with `prefix` (null text → null). One fused pass; bit-identical to the
  * builtin `explode`+`md5(substr)`+`startsWith` formulation
  * ([[graft.operators.Dedup.gramAnchorsBuiltin]] is the differential twin).
  */
case class GramAnchors(child: Expression, k: Int, prefix: String)
    extends UnaryExpression with StringInputCheck {
  require(k >= 1, s"gram length k must be >= 1, got $k")
  // md5 hex is 32 chars: a longer prefix can never match, and the nibble
  // probe would read past the 16-byte digest — reject it loudly (the same
  // guard every Dedup entry point applies)
  require(prefix.length <= 32 && prefix.matches("[0-9a-f]*"),
    s"prefix must be lowercase hex, at most 32 chars (md5 width), got '$prefix'")

  // parsed once at construction; shipped to generated code as a reference
  // object so neither eval path re-parses the plan constant per row
  private val prefixNibbles: Array[Int] =
    prefix.map(Character.digit(_, 16)).toArray

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("off", IntegerType, nullable = false),
      StructField("h", BinaryType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Kernels.gramAnchors(input.asInstanceOf[UTF8String], k, prefixNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nibRef = ctx.addReferenceObj("gramAnchorNibbles", prefixNibbles, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Kernels.gramAnchors($c, $k, $nibRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused PII scrub (null text → null): struct of the cleaned text plus one
  * staged hit count per pattern — one matcher pass per pattern, replacement
  * and count together. Differential twins:
  * [[graft.operators.TextAnalysis.redactPii]] / `piiCounts`.
  */
case class PiiScrub(child: Expression)
    extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = Kernels.PiiScrubType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Kernels.piiScrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (InternalRow) graft.functions.expressions.Kernels.piiScrub($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct canonical tokens hashed to 60-bit longs (SimHash front end). */
case class HashedTokens(child: Expression)
    extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Kernels.hashedTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Kernels.hashedTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
