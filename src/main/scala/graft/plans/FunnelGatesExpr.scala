package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All four curation-funnel gate signals — `rep_keep`, `gop_keep`,
  * `quality`, `fp` — from ONE pass over the document bytes, as a
  * single struct-valued scalar expression.
  *
  * Why this exists: the declarative
  * [[graft.llm.TextAnalysis.funnelStats]] already fuses the funnel
  * into one tokenization behind a generator barrier, but each signal
  * is a higher-order-function lambda (aggregate / transform / filter),
  * and Spark evaluates HOF lambdas interpreted — per token, per
  * n-gram position, per line, a full Catalyst `eval` tree walk.
  * Profiled column-by-column on the ×64 heavy fixture the scan costs
  * ~20 s spread evenly across the six signal groups (sort+runfrac
  * ~4.5 s, dup-ngrams ~4.5 s, quality ~4.8 s, Gopher ~4 s, fp ~2.7 s,
  * lines ~1 s) — there is no single hot column, the HOF machinery IS
  * the cost. Per document the whole funnel is a few-hundred-step
  * primitive loop that belongs in one compiled function: tokenize
  * once over the raw UTF-8 bytes, one UTF8String sort, one hash-set
  * sweep, and every ratio falls out.
  *
  * Semantics are IDENTICAL to the declarative form — same tokenizer
  * ([[MinHashShinglesSigExpr.forEachToken]], the byte-exact replica
  * of `split(trim(text), "\\s+")`), same binary token sort
  * (UTF8String order — what `array_sort` uses), same multi-arg
  * xxhash64 n-gram keys (seed 42, chained), same Java regexes for the
  * symbol/bullet/ellipsis/alpha/punctuation signals, same md5-hex
  * fingerprint of the space-joined sorted tokens, and the same IEEE
  * double evaluation order for every ratio — so the funnel's DuckDB
  * oracle and every consumer are unaffected. PipelineSpec pins the
  * equivalence column-for-column against the retained declarative
  * form on the documents fixture plus adversarial literals.
  *
  * Null handling matches: null text → null struct (every downstream
  * gate filter drops the row either way).
  *
  * Registered as `funnel_gates(text, <11 literal thresholds>)`.
  * CodegenFallback: one eval per DOCUMENT — the loop inside is the
  * work; per-row fallback overhead is noise at that granularity.
  *
  * Ref (semantics): Gopher/MassiveText rules, Rae et al. 2021 §A1.1 —
  * the same public thresholds the declarative form implements. */
case class FunnelGatesExpr(
    child: Expression,
    maxTopTokenFrac: Double, maxDup2Frac: Double, maxDup3Frac: Double,
    minWords: Int, maxWords: Int,
    minMeanWordLen: Double, maxMeanWordLen: Double,
    maxSymbolRatio: Double, maxBulletFrac: Double, maxEllipsisFrac: Double,
    minAlphaFrac: Double, minStopHits: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"funnel_gates expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = FunnelGatesExpr.Schema
  override def prettyName: String = FunnelGatesExpr.Name

  override protected def nullSafeEval(input: Any): Any = {
    import FunnelGatesExpr._
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes

    // ---- tokenize once (byte-exact split(trim(text), "\s+")) ----
    val toks = collectTokens(bytes)
    val n = toks.length // >= 1 by construction (empty text -> [""])
    var i = 0

    // ---- one sweep: distinct set, char-length sum, per-token flags --
    val tokSet = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    var sumChars = 0L
    var alphaCount = 0
    var enStopCount = 0
    i = 0
    while (i < n) {
      val t = toks(i)
      tokSet.add(t)
      sumChars += t.numChars()
      if (hasLetter(t)) alphaCount += 1
      if (EnStopSet.contains(t)) enStopCount += 1
      i += 1
    }
    val distinctCount = tokSet.size
    var gopherHits = 0
    i = 0
    while (i < GopherStopArr.length) {
      if (tokSet.contains(GopherStopArr(i))) gopherHits += 1
      i += 1
    }

    // ---- sorted tokens: longest equal run + md5 fingerprint ----
    val sorted = toks.clone()
    // Natural ordering: UTF8String.compareTo is the binary (UTF-8
    // byte) comparison array_sort uses for strings.
    java.util.Arrays.sort(sorted.asInstanceOf[Array[Object]])
    var bestRun = 0; var run = 0
    val md = md5Local.get(); md.reset()
    i = 0
    while (i < n) {
      if (i > 0 && sorted(i) == sorted(i - 1)) run += 1 else run = 1
      if (run > bestRun) bestRun = run
      if (i > 0) md.update(0x20.toByte)
      val b = sorted(i).getBytes
      md.update(b, 0, b.length)
      i += 1
    }
    val fp = UTF8String.fromString(hex(md.digest()))
    val topFrac = bestRun.toDouble / n.toDouble

    // ---- hashed n-gram repeat fractions (multi-arg xxhash64) ----
    val dup2 = dupNgramFrac(toks, 2)
    val dup3 = dupNgramFrac(toks, 3)
    val repKeep = topFrac <= maxTopTokenFrac &&
      dup2 <= maxDup2Frac && dup3 <= maxDup3Frac

    // ---- Gopher line + symbol signals over the ORIGINAL text ----
    val str = u.toString
    // regexp_extract_all(text, "#|\.\.\.|…") match count, hand-rolled:
    // at each position try '#', then "...", then '…' (the pattern's
    // alternation order; '.' and '…' first chars are disjoint so the
    // non-overlapping find sequence is identical), advancing past a
    // match like Matcher.find does.
    var symbolCount = 0
    var ci = 0
    while (ci < str.length) {
      val c = str.charAt(ci)
      if (c == '#') { symbolCount += 1; ci += 1 }
      else if (c == '.' && ci + 2 < str.length &&
        str.charAt(ci + 1) == '.' && str.charAt(ci + 2) == '.') {
        symbolCount += 1; ci += 3
      } else if (c == '…') { symbolCount += 1; ci += 1 }
      else ci += 1
    }
    // split(text, "\n") with limit -1, and per line the trimmed
    // bullet/ellipsis checks — `trim` strips 0x20 only; the bullet
    // pattern is "first char in [-*•]", the ellipsis pattern is
    // "ends with ... or …".
    var nLines = 0; var bulletCount = 0; var ellipsisCount = 0
    var lineStart = 0
    var scan = 0
    while (scan <= str.length) {
      if (scan == str.length || str.charAt(scan) == '\n') {
        var lo = lineStart; var hi = scan
        while (lo < hi && str.charAt(lo) == ' ') lo += 1
        while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
        nLines += 1
        if (lo < hi) {
          val first = str.charAt(lo)
          if (first == '-' || first == '*' || first == '•') bulletCount += 1
          // Java regex `$` (non-MULTILINE) also matches just before a
          // FINAL line terminator (\r, NEL, LS, PS — \n can't appear,
          // the line was split on it), so "end...\r" ends in an
          // ellipsis under the declarative EllipsisRe. Check the true
          // end and, when the last char is such a terminator, the
          // position before it.
          @inline def endsEllipsis(e: Int): Boolean = e > lo && {
            val last = str.charAt(e - 1)
            last == '…' || (e - lo >= 3 && last == '.' &&
              str.charAt(e - 2) == '.' && str.charAt(e - 3) == '.')
          }
          val t = str.charAt(hi - 1)
          val beforeTerm = t == '\r' || t == '\u0085' ||
            t == '\u2028' || t == '\u2029'
          if (endsEllipsis(hi) || (beforeTerm && endsEllipsis(hi - 1)))
            ellipsisCount += 1
        }
        lineStart = scan + 1
      }
      scan += 1
    }
    val meanWordLen = sumChars.toDouble / n.toDouble
    val symbolRatio = symbolCount.toDouble / n.toDouble
    val bulletFrac = bulletCount.toDouble / nLines.toDouble
    val ellipsisFrac = ellipsisCount.toDouble / nLines.toDouble
    val alphaFrac = alphaCount.toDouble / n.toDouble
    val gopKeep = n >= minWords && n <= maxWords &&
      meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen &&
      symbolRatio <= maxSymbolRatio && bulletFrac <= maxBulletFrac &&
      ellipsisFrac <= maxEllipsisFrac && alphaFrac >= minAlphaFrac &&
      gopherHits >= minStopHits

    // ---- quality score (same IEEE evaluation order) ----
    val textChars = u.numChars()
    val quality =
      if (trimmedEmpty(bytes)) 0.0
      else {
        // length(text) - length(regexp_replace(text, "[^\p{L}\p{N}\s]",
        // "")) = the count of code points in the punct class, without
        // building the replaced string: \p{L} = Character.isLetter
        // categories, \p{N} = the three Unicode number categories,
        // \s = the regex class [ \t\n\x0B\f\r] (NOT Unicode spaces).
        var punctCount = 0
        var pi = 0
        while (pi < str.length) {
          val cp = str.codePointAt(pi)
          if (!isLetterOrNumberOrWs(cp)) punctCount += 1
          pi += Character.charCount(cp)
        }
        val punct = punctCount.toDouble / Math.max(textChars, 1).toDouble
        val distinctFrac = distinctCount.toDouble / n.toDouble
        val stopFrac = enStopCount.toDouble / n.toDouble
        distinctFrac * 0.5 + (1.0 - punct) * 0.3 + (1.0 - stopFrac) * 0.2
      }

    val row = new GenericInternalRow(4)
    row.update(0, repKeep)
    row.update(1, gopKeep)
    row.update(2, quality)
    row.update(3, fp)
    row
  }

  override protected def withNewChildInternal(
      newChild: Expression): FunnelGatesExpr = copy(child = newChild)
}

object FunnelGatesExpr {
  val Name = "funnel_gates"

  val Schema: StructType = StructType(Seq(
    StructField("rep_keep", BooleanType, nullable = false),
    StructField("gop_keep", BooleanType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("fp", StringType, nullable = false)))

  private val LetterPat = java.util.regex.Pattern.compile("\\p{L}")

  /** The `[^\p{L}\p{N}\s]` complement, code-point-wise: Unicode
    * letter (what `Character.isLetter` covers — exactly the five
    * regex L categories), Unicode number (\p{N} = Nd|Nl|No, wider
    * than `isDigit`), or the REGEX \s class — the six ASCII chars
    * `[ \t\n\x0B\f\r]`, NOT Unicode whitespace. */
  @inline private def isLetterOrNumberOrWs(cp: Int): Boolean = {
    if (Character.isLetter(cp)) return true
    val t = Character.getType(cp)
    if (t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER)
      return true
    cp == ' ' || (cp >= 0x09 && cp <= 0x0D)
  }

  private val EnStopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.llm.TextAnalysis.EnStopwords
      .foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  private val GopherStopArr: Array[UTF8String] =
    graft.llm.TextAnalysis.GopherStopwords
      .map(UTF8String.fromString).toArray

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Tokens of `bytes` as zero-copy UTF8String views — the byte-exact
    * split(trim(text), "\\s+") replica ([[MinHashShinglesSigExpr
    * .forEachToken]]) materialized once; shared by [[FunnelGatesExpr]]
    * and [[NgramHashesExpr]] so the tokenizer boundary semantics
    * cannot drift between the two. */
  private[plans] def collectTokens(bytes: Array[Byte]): Array[UTF8String] = {
    var nTok = 0
    var starts = new Array[Int](16)
    var lens = new Array[Int](16)
    MinHashShinglesSigExpr.forEachToken(bytes, (st, l) => {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        lens = java.util.Arrays.copyOf(lens, nTok * 2)
      }
      starts(nTok) = st; lens(nTok) = l; nTok += 1
    })
    val toks = new Array[UTF8String](nTok)
    var i = 0
    while (i < nTok) {
      toks(i) = UTF8String.fromBytes(bytes, starts(i), lens(i))
      i += 1
    }
    toks
  }

  /** The multi-arg xxhash64 chain over `order` tokens starting at `i`
    * (seed 42, child-by-child — bit-identical to the declarative
    * expression; a null token passes the seed through, like a null
    * xxhash64 child). The ONE implementation every native n-gram-key
    * site uses. */
  @inline private[plans] def chainHash(toks: Array[UTF8String], i: Int,
                                       order: Int): Long = {
    var h = 42L
    var k = 0
    while (k < order) {
      val t = toks(i + k)
      if (t != null)
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
      k += 1
    }
    h
  }

  /** `rlike("\\p{L}")` per token, with an ASCII fast path: an ASCII
    * letter anywhere decides true; a pure-ASCII token without one
    * decides false; only tokens carrying non-ASCII bytes pay the
    * regex (any non-ASCII letter). */
  private def hasLetter(t: UTF8String): Boolean = {
    val b = t.getBytes
    var i = 0
    var nonAscii = false
    while (i < b.length) {
      val c = b(i) & 0xFF
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) return true
      if (c >= 0x80) nonAscii = true
      i += 1
    }
    nonAscii && LetterPat.matcher(t.toString).find()
  }

  /** `length(trim(text)) === 0` on the raw bytes. */
  private def trimmedEmpty(bytes: Array[Byte]): Boolean = {
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    lo >= hi
  }

  /** `dupFracOf(hashNgrams(toks, order))`: multi-arg xxhash64 keys
    * (seed 42, chained child-by-child — bit-identical to the
    * declarative expression) with repeat fraction over a long set. */
  private def dupNgramFrac(toks: Array[UTF8String], order: Int): Double = {
    val n = toks.length
    if (n < order) return 0.0
    val count = n - order + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    var distinct = 0
    var i = 0
    while (i < count) {
      if (seen.add(chainHash(toks, i, order))) distinct += 1
      i += 1
    }
    (count - distinct).toDouble / count.toDouble
  }

  private[plans] val info = new ExpressionInfo(classOf[FunnelGatesExpr].getName,
    Name)

  private def lit(e: Expression, what: String): Any = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal => l.value
    case other => throw new IllegalArgumentException(
      s"$Name: $what must be a literal, got $other")
  }

  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 13,
      s"$Name expects 13 arguments (text + 11 thresholds), " +
        s"got ${children.size}")
    def d(i: Int, w: String) =
      lit(children(i), w).asInstanceOf[Number].doubleValue()
    def n(i: Int, w: String) =
      lit(children(i), w).asInstanceOf[Number].intValue()
    FunnelGatesExpr(children(0),
      d(1, "maxTopTokenFrac"), d(2, "maxDup2Frac"), d(3, "maxDup3Frac"),
      n(4, "minWords"), n(5, "maxWords"),
      d(6, "minMeanWordLen"), d(7, "maxMeanWordLen"),
      d(8, "maxSymbolRatio"), d(9, "maxBulletFrac"), d(10, "maxEllipsisFrac"),
      d(11, "minAlphaFrac"), n(12, "minStopHits"))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** `hashNgrams(tokens, n)` — the multi-arg-xxhash64 token n-gram key
  * array — as ONE byte-scan expression, accepting either the raw text
  * (tokenize inline via [[MinHashShinglesSigExpr.forEachToken]], no
  * token array ever materialized) or a pre-staged `array<string>`.
  *
  * Why: the declarative form is `transform(sequence(...), i =>
  * xxhash64(element_at(toks, i+1), ..., element_at(toks, i+n)))` — an
  * interpreted lambda walk of n element_at + hash evals PER POSITION.
  * It backs the hottest window families (passage coverage/scrub window
  * hashes, hashed benchmark decontamination), where it is the
  * window-generation term of the whole operator (~4.5 s of the lowdup
  * coverage pass). Here each position is n chained XXH64 calls over
  * token byte slices in one compiled loop.
  *
  * Bit-identical to `TextAnalysis.hashNgrams`: same seed-42 chain
  * child-by-child, same `when(size >= n, ...).otherwise(empty)`
  * boundary (fewer tokens than n, or null text whose staged token
  * array is null → EMPTY array, not null), positions 0..len-n in
  * order. DedupSpec pins the equivalence on corpus rows + edges.
  *
  * Registered as `ngram_hashes(textOrTokens, n)` (n literal). */
case class NgramHashesExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  // n = 1 is the degenerate "hash every token" form (seed-42 chain of
  // one = xxhash64(tok)) — the LM families zip it with the n = 2 array
  // for (context-key, bigram-key) pairs.
  require(n >= 1, s"ngram_hashes needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes expects string or array<string>, " +
          s"got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = NgramHashesExpr.Name

  private val Empty = new org.apache.spark.sql.catalyst.util
    .GenericArrayData(new Array[Long](0))

  // Null input maps to the declarative form's empty array (its
  // when().otherwise(empty) guard), so eval is overridden instead of
  // nullSafeEval.
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return Empty
    val toks = v match {
      case s: UTF8String =>
        // Inline tokenize: the SAME collectTokens the funnel scan uses
        // (zero-copy views over the text bytes).
        FunnelGatesExpr.collectTokens(s.getBytes)
      case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
        val nTok = arr.numElements()
        val ts = new Array[UTF8String](nTok)
        var i = 0
        while (i < nTok) {
          // Declarative element_at would propagate nulls into the hash
          // as null children (xxhash64 skips them: seed passes
          // through) — chainHash matches that.
          ts(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
          i += 1
        }
        ts
    }
    if (toks.length < n) return Empty
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = FunnelGatesExpr.chainHash(toks, i, n)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashesExpr = copy(child = newChild)
}

object NgramHashesExpr {
  val Name = "ngram_hashes"

  private[plans] val info = new ExpressionInfo(classOf[NgramHashesExpr].getName,
    Name)

  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"$Name expects 2 arguments (textOrTokens, n), got ${children.size}")
    val n = children(1) match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal =>
        l.value.asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"$Name: n must be a literal, got $other")
    }
    NgramHashesExpr(children(0), n)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
