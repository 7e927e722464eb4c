package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature of one document as ONE scalar expression
  * over its shingle array: for every shingle, hash once to the 31-bit
  * core, then update all `numHashes` permutation minima
  * `(h·aᵢ + bᵢ) mod p` in a tight JIT loop over a primitive long[].
  *
  * Why this exists: the declarative pipeline — explode the shingle
  * array (74 M rows on the heavy fixture), hash per row, then
  * `numHashes` separate `min(pmod(h·a + b, p))` aggregate expressions
  * against a 128-column buffer — spent 28.6 s in the aggregate alone
  * (8·10⁹ per-expression buffer updates at ~9 M/core/s; raising
  * spark.sql.codegen.maxFields moved it <10%, so the cost is
  * expression-evaluation machinery, not codegen fallback). Per-doc
  * the whole signature is a ~30 K-step loop that belongs in ONE
  * compiled function — and doing it in the projection deletes the
  * explode, the aggregation, AND its shuffle: signatures become
  * embarrassingly parallel scan work, the shape a 100 TB corpus
  * needs. Measured: the heavy lowdup band table drops 35.3 s → 8.2 s.
  *
  * Semantics are IDENTICAL to the declarative form — same per-shingle
  * string hash (xxhash64 seed 42, or the md5 31-bit core when
  * `portable`), same coefficient family
  * ([[graft.llm.Dedup.minhashCoeffs]]), same modulus, same min — so
  * the d9/d14 DuckDB oracles and every banded consumer are
  * unaffected; DedupSpec pins the equivalence bit for bit against the
  * retained declarative reference.
  *
  * Null/empty handling matches the aggregate form it replaces: null
  * array → null; null elements are skipped; a doc with NO shingles
  * yields Long.MaxValue minima (the aggregate form simply had no row
  * to aggregate — shinglesOfTokens never emits an empty array for
  * nonempty docs, and empty docs produce one "" shingle).
  *
  * Registered as `minhash_sig_arr(shingles, numHashes, portable)`
  * (last two literal). CodegenFallback: one eval per DOCUMENT — the
  * loop inside is the work; per-row fallback overhead is noise at
  * that granularity. */
case class MinHashShinglesSigExpr(
    child: Expression, numHashes: Int, portable: Boolean)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val (as, bs) = {
    val cs = graft.llm.Dedup.minhashCoeffs(numHashes)
    (cs.map(_._1).toArray, cs.map(_._2).toArray)
  }
  private val prime = graft.llm.Dedup.MinhashPrime

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig_arr expects array<string> or string, " +
            s"got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_arr"

  /** x mod (2³¹−1) via Mersenne shift-add folding — exactly `x % prime`
    * for 0 ≤ x < 2⁶² (the `(h·a + b)` bound with 31-bit operands), at a
    * fraction of the hardware-division cost; the dominant op of the
    * whole signature loop. */
  @inline private def mod31(x: Long): Long = {
    var v = (x >>> 31) + (x & 0x7FFFFFFFL)
    v = (v >>> 31) + (v & 0x7FFFFFFFL)
    if (v >= prime) v - prime else v
  }

  @inline private def fold(h: Long, buf: Array[Long]): Unit = {
    val a = as; val b = bs
    var j = 0
    while (j < numHashes) {
      val p = mod31(h * a(j) + b(j))
      if (p < buf(j)) buf(j) = p
      j += 1
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    input match {
      case s: UTF8String =>
        // STRING input: tokenize inline over the raw UTF-8 bytes,
        // reproducing `split(trim(text), "\\s+")` exactly (see
        // MinHashShinglesSigExpr.forEachToken). Duplicates need no
        // dedup: min is idempotent, so the multiset signature equals
        // the distinct-set signature.
        val bytes = s.getBytes
        MinHashShinglesSigExpr.forEachToken(bytes, (start, len) =>
          fold(MinHashShinglesSigExpr.core31Bytes(
            bytes, start, len, portable), buf))
      case arr: ArrayData =>
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val s = arr.getUTF8String(i)
            fold(MinHashShinglesSigExpr.core31(s, portable), buf)
          }
          i += 1
        }
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashShinglesSigExpr = copy(child = newChild)
}

/** LSH band-bucket keys of a signature as ONE scalar expression: for
  * band b, the bucket key is the comma-joined decimal string of
  * sig[b·r .. b·r+r), hashed (xxhash64 seed 42 over its UTF-8 bytes —
  * bit-identical to `xxhash64(array_join(transform(slice(sig, …),
  * cast string), ","))`, emitted as array<long>) unless `raw` keeps
  * the joined string itself as array<string> (the portable/d12 band
  * form, replayable in SQL). Positionally indexed — pair with
  * posexplode for the (band, bucket) table. Hashed buckets stay LONG:
  * the downstream bucket aggregation groups on millions of (band,
  * bucket) keys, and long keys sort/hash several times cheaper than
  * their decimal strings when the aggregate spills to sort.
  *
  * Why: the declarative form evaluated 16 interpreted
  * slice/transform/array_join/xxhash64 HOF chains per document —
  * measured ~10.7 s of the heavy lowdup band table, the largest
  * remaining piece once signatures went native. This is one compiled
  * loop; the band table drops to scan + explode. */
case class MinHashBandsExpr(
    child: Expression, bands: Int, rowsPerBand: Int, raw: Boolean)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands expects array<long>, got ${other.simpleString}")
    }

  override def dataType: DataType =
    if (raw) ArrayType(StringType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    // Fail loudly on a hash-family mismatch: UnsafeArrayData.getLong
    // past numElements reads adjacent buffer memory without error, so
    // a signature built with the wrong numHashes would otherwise yield
    // silently wrong bucket keys.
    require(sig.numElements() >= bands * rowsPerBand,
      s"minhash_bands: signature has ${sig.numElements()} elements, " +
        s"need bands*rowsPerBand = ${bands * rowsPerBand}")
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(rowsPerBand * 12)
      var i = 0
      while (i < rowsPerBand) {
        if (i > 0) sb.append(',')
        sb.append(sig.getLong(b * rowsPerBand + i))
        i += 1
      }
      val key = UTF8String.fromString(sb.toString)
      out(b) =
        if (raw) key
        else java.lang.Long.valueOf(
          XXH64.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset,
            key.numBytes, 42L))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandsExpr = copy(child = newChild)
}

object MinHashBandsExpr {
  val Name = "minhash_bands"
  private[plans] val info = new ExpressionInfo(classOf[MinHashBandsExpr].getName, Name)
  private def lit(e: Expression, what: String): Any = {
    require(e.foldable, s"minhash_bands: $what must be a literal, got $e")
    e.eval(null)
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 4,
      s"minhash_bands expects 4 arguments (sig, bands, rowsPerBand, raw), " +
        s"got ${children.size}")
    MinHashBandsExpr(children(0),
      lit(children(1), "bands").asInstanceOf[Number].intValue(),
      lit(children(2), "rowsPerBand").asInstanceOf[Number].intValue(),
      lit(children(3), "raw").asInstanceOf[Boolean])
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** `array_distinct(split(trim(text), "\\s+"))` as one byte-scan
  * expression: whitespace-run tokenize over the raw UTF-8 bytes plus
  * first-occurrence dedup. Bit-identical to the composed built-ins
  * (trim strips ≤ U+0020 at both ends, \s is the six ASCII whitespace
  * bytes, array_distinct keeps first-occurrence order; an
  * empty/all-whitespace text yields [""], like split("")). The
  * composed form — regex split, full token-array materialization,
  * interpreted array_distinct — costs ~5.8 s per heavy-corpus scan
  * and the LSH verify stage pays it twice; this is one compiled pass.
  */
case class TokensDistinctExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tokens_distinct expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens_distinct"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val seen = new java.util.LinkedHashSet[UTF8String]()
    MinHashShinglesSigExpr.forEachToken(bytes, (start, len) =>
      seen.add(UTF8String.fromBytes(bytes, start, len)))
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokensDistinctExpr = copy(child = newChild)
}

object TokensDistinctExpr {
  val Name = "tokens_distinct"
  private[plans] val info =
    new ExpressionInfo(classOf[TokensDistinctExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"tokens_distinct expects 1 argument, got ${children.size}")
    TokensDistinctExpr(children(0))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** The distinct-token set of a text as 64-bit xxhash values (seed 42,
  * full width — NOT the 31-bit signature core): one byte scan, no
  * token string ever materialized. The production LSH verify stage's
  * token representation — set sizes and intersection counts (and so
  * Jaccard) equal [[TokensDistinctExpr]]'s modulo 64-bit token-hash
  * collisions (p ≈ n²/2⁶⁵ per document — the same tolerance class as
  * the hashed band-bucket keys), while the per-pair shuffle payload
  * drops from ~string bytes to 8 bytes/token and the intersection
  * compares longs instead of strings. Distinctness is by HASH: a
  * colliding token pair would also shrink the set size, exactly as if
  * the two tokens were equal. The portable/oracle paths keep the
  * string form. Registered as `tokens_distinct_hashed(text)`. */
case class TokensDistinctHashedExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tokens_distinct_hashed expects string, got " +
          s"${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "tokens_distinct_hashed"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    MinHashShinglesSigExpr.forEachToken(bytes, (start, len) =>
      seen.add(java.lang.Long.valueOf(XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        len, 42L))))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokensDistinctHashedExpr = copy(child = newChild)
}

object TokensDistinctHashedExpr {
  val Name = "tokens_distinct_hashed"
  private[plans] val info =
    new ExpressionInfo(classOf[TokensDistinctHashedExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"tokens_distinct_hashed expects 1 argument, got ${children.size}")
    TokensDistinctHashedExpr(children(0))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** The whole SimHash fingerprint of one document as ONE scalar
  * expression: tokenize inline (split(trim) semantics, every
  * OCCURRENCE votes — not the distinct set), hash each token once
  * (production xxhash64 seed 42; portable the 40-bit md5 prefix
  * `conv(substr(md5(t),1,10),16,10)`), accumulate ±1 votes per bit,
  * emit the sign fingerprint (bit set iff votes > 0 — ties clear,
  * like the declarative `when(v > 0, …)`). Bit-identical to
  * [[graft.llm.Dedup.simhashTableDeclarative]]'s explode + `bits`-sum
  * aggregation (spec-pinned); replaces that per-token shuffle row +
  * 32-column aggregate with pure scan work. Registered as
  * `simhash_fp(text, bits, portable)`. */
case class SimHashExpr(child: Expression, bits: Int, portable: Boolean)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_fp expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val votes = new Array[Int](bits)
    MinHashShinglesSigExpr.forEachToken(bytes, (start, len) => {
      val h = MinHashShinglesSigExpr.hashToken(bytes, start, len, portable)
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    })
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashExpr {
  val Name = "simhash_fp"
  private[plans] val info = new ExpressionInfo(classOf[SimHashExpr].getName, Name)
  private def litVal(e: Expression, what: String): Any = {
    require(e.foldable, s"simhash_fp: $what must be a literal, got $e")
    e.eval(null)
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 3,
      s"simhash_fp expects 3 arguments (text, bits, portable), " +
        s"got ${children.size}")
    SimHashExpr(children(0),
      litVal(children(1), "bits").asInstanceOf[Number].intValue(),
      litVal(children(2), "portable").asInstanceOf[Boolean])
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** The one-permutation-hashing (OPH) MinHash signature of one document
  * as ONE scalar expression: per shingle ONE 31-bit hash, binned by
  * `h mod bins` with a per-bin min, then circular densification —
  * every empty position borrows the value of the next occupied bin
  * at-or-after it, wrapping past the last occupied bin to the FIRST.
  * Bit-identical to the declarative pipeline it replaces (explode +
  * (doc, bin) min aggregate + sorted-segment expansion; spec-pinned),
  * including the d14 oracle's backward-fill semantics. Same
  * string/array<string> input contract as [[MinHashShinglesSigExpr]]
  * (string input tokenizes inline via forEachToken; duplicates are
  * min-idempotent). A doc with no occupied bins cannot occur (every
  * doc yields ≥ 1 shingle).
  *
  * Registered as `minhash_oph_sig(shingles, bins, portable)`. */
case class MinHashOphSigExpr(
    child: Expression, bins: Int, portable: Boolean)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_oph_sig expects array<string> or string, " +
            s"got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_oph_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val buf = Array.fill(bins)(Long.MaxValue) // MaxValue = empty bin
    @inline def fold(h: Long): Unit = {
      val b = (h % bins).toInt
      if (h < buf(b)) buf(b) = h
    }
    input match {
      case s: UTF8String =>
        val bytes = s.getBytes
        MinHashShinglesSigExpr.forEachToken(bytes, (start, len) =>
          fold(MinHashShinglesSigExpr.core31Bytes(bytes, start, len, portable)))
      case arr: ArrayData =>
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i))
            fold(MinHashShinglesSigExpr.core31(arr.getUTF8String(i), portable))
          i += 1
        }
    }
    // Densify: out[p] = value of the next occupied bin >= p, wrapping
    // past the last occupied bin to the first occupied one — one
    // backward fill seeded with the first occupied value.
    var first = Long.MaxValue
    var i = 0
    while (i < bins && first == Long.MaxValue) {
      if (buf(i) != Long.MaxValue) first = buf(i)
      i += 1
    }
    val out = new Array[Long](bins)
    var carry = first
    var p = bins - 1
    while (p >= 0) {
      if (buf(p) != Long.MaxValue) carry = buf(p)
      out(p) = carry
      p -= 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashOphSigExpr = copy(child = newChild)
}

object MinHashOphSigExpr {
  val Name = "minhash_oph_sig"
  private[plans] val info = new ExpressionInfo(classOf[MinHashOphSigExpr].getName, Name)
  private def litVal(e: Expression, what: String): Any = {
    require(e.foldable, s"minhash_oph_sig: $what must be a literal, got $e")
    e.eval(null)
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 3,
      s"minhash_oph_sig expects 3 arguments (shingles, bins, portable), " +
        s"got ${children.size}")
    MinHashOphSigExpr(children(0),
      litVal(children(1), "bins").asInstanceOf[Number].intValue(),
      litVal(children(2), "portable").asInstanceOf[Boolean])
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** `size(array_intersect(a, b))` for DISTINCT string (or long — the
  * hashed-verify path's token hashes) arrays as one hash-set pass.
  * Bit-identical on duplicate-free inputs (the
  * jaccardDistinct contract — array_intersect's output dedup is then a
  * no-op): build a set of `a`, count members of `b` in it. The LSH
  * verify stage evaluates this once per candidate pair (10.8 M pairs ×
  * ~230-token arrays on the heavy fixture) and the interpreted
  * array_intersect materialized the full intersection array per pair
  * just to take its size. Null elements never match (array_intersect
  * keeps a null only when present in BOTH; token arrays carry none —
  * and jaccard's division semantics are unchanged either way because
  * the division stays in Column space at the caller). */
case class ArrayIntersectSizeExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_intersect_size expects two array<string> or two " +
        s"array<long>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "array_intersect_size"

  private val isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // Probe the smaller side's set with the larger side (both distinct,
    // so the count is symmetric).
    val (s, p) = if (xs.numElements() <= ys.numElements()) (xs, ys) else (ys, xs)
    if (isLong) return evalLong(s, p)
    val set = new java.util.HashSet[UTF8String](s.numElements() * 2)
    var sNull = false; var pNull = false
    var i = 0
    val ns = s.numElements()
    while (i < ns) {
      if (s.isNullAt(i)) sNull = true else set.add(s.getUTF8String(i))
      i += 1
    }
    var cnt = 0
    var j = 0
    val np = p.numElements()
    while (j < np) {
      if (p.isNullAt(j)) pNull = true
      else if (set.contains(p.getUTF8String(j))) cnt += 1
      j += 1
    }
    // array_intersect keeps a null element iff BOTH sides carry one.
    if (sNull && pNull) cnt + 1 else cnt
  }

  /** Long branch: open-address probing over a primitive table — the
    * verify hot loop runs this once per candidate pair, and a boxed
    * HashSet would allocate per element. Same null semantics as the
    * string branch. Zero needs a presence flag (it is the table's
    * empty marker). */
  private def evalLong(s: ArrayData, p: ArrayData): Any = {
    val ns = s.numElements()
    var cap = 8
    while (cap < ns * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var sNull = false; var pNull = false
    var i = 0
    while (i < ns) {
      if (s.isNullAt(i)) sNull = true
      else {
        val v = s.getLong(i)
        if (v == 0L) hasZero = true
        else {
          var slot = (java.lang.Long.hashCode(v) & mask)
          while (table(slot) != 0L && table(slot) != v)
            slot = (slot + 1) & mask
          table(slot) = v
        }
      }
      i += 1
    }
    var cnt = 0
    var j = 0
    val np = p.numElements()
    while (j < np) {
      if (p.isNullAt(j)) pNull = true
      else {
        val v = p.getLong(j)
        if (v == 0L) { if (hasZero) cnt += 1 }
        else {
          var slot = (java.lang.Long.hashCode(v) & mask)
          while (table(slot) != 0L && table(slot) != v)
            slot = (slot + 1) & mask
          if (table(slot) == v) cnt += 1
        }
      }
      j += 1
    }
    if (sNull && pNull) cnt + 1 else cnt
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

object ArrayIntersectSizeExpr {
  val Name = "array_intersect_size"
  private[plans] val info =
    new ExpressionInfo(classOf[ArrayIntersectSizeExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"array_intersect_size expects 2 arguments, got ${children.size}")
    ArrayIntersectSizeExpr(children(0), children(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

object MinHashShinglesSigExpr {
  val Name = "minhash_sig_arr"

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The shared 31-bit shingle core, bit-identical to the column forms:
    * production `xxhash64(s) & 0x7FFFFFFF` (seed 42 over the UTF-8
    * bytes — exactly XxHash64Function's StringType path), portable
    * `conv(substr(md5(s), 1, 8), 16, 10) & 0x7FFFFFFF` (first four
    * digest bytes, big-endian). */
  private[plans] def core31(s: UTF8String, portable: Boolean): Long =
    if (portable) {
      val bytes = s.getBytes
      md5Core(bytes, 0, bytes.length)
    } else {
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L) & 0x7FFFFFFFL
    }

  /** Tokenization shared by the inline STRING paths, reproducing
    * `split(trim(text), "\\s+")` BIT-EXACTLY (spec-pinned against the
    * composed built-ins):
    *  - Spark's `trim` strips ONLY U+0020 spaces at both ends (other
    *    whitespace survives);
    *  - `split` with Java regex \s+ (the six ASCII whitespace bytes,
    *    which never occur inside UTF-8 multibyte sequences) and
    *    limit -1 KEEPS boundary empties: a leading or trailing
    *    whitespace run (e.g. a surviving \n after the space-only trim)
    *    yields an "" token there, and an empty/all-space text yields
    *    exactly [""].
    * Calls `f(start, len)` per token over `bytes`. */
  private[plans] def forEachToken(bytes: Array[Byte],
                                  f: (Int, Int) => Unit): Unit = {
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Byte): Boolean = {
      val c = b & 0xFF
      c == 0x20 || (c >= 0x09 && c <= 0x0D)
    }
    if (lo >= hi) f(0, 0)
    else {
      var i = lo
      if (isWs(bytes(i))) f(0, 0) // leading separator → leading ""
      while (i < hi) {
        while (i < hi && isWs(bytes(i))) i += 1
        if (i < hi) {
          val start = i
          while (i < hi && !isWs(bytes(i))) i += 1
          f(start, i - start)
        } else f(0, 0) // trailing separator run → trailing ""
      }
    }
  }

  /** Same core over a byte slice (the inline-tokenizer path). */
  private[plans] def core31Bytes(bytes: Array[Byte], offset: Int, len: Int,
                                 portable: Boolean): Long =
    if (portable) md5Core(bytes, offset, len)
    else XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offset,
      len, 42L) & 0x7FFFFFFFL

  private def md5Core(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val d = md5Local.get()
    d.reset()
    d.update(bytes, offset, len)
    val dig = d.digest()
    (((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
      ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)) & 0x7FFFFFFFL
  }

  /** SimHash's FULL-WIDTH token hash (unlike the 31-bit signature
    * core): production = plain xxhash64 seed 42; portable = the
    * 40-bit md5 prefix `conv(substr(md5(t), 1, 10), 16, 10)` (first
    * five digest bytes, big-endian). */
  private[plans] def hashToken(bytes: Array[Byte], offset: Int, len: Int,
                               portable: Boolean): Long =
    if (portable) {
      val d = md5Local.get()
      d.reset()
      d.update(bytes, offset, len)
      val dig = d.digest()
      ((dig(0) & 0xFFL) << 32) | ((dig(1) & 0xFFL) << 24) |
        ((dig(2) & 0xFFL) << 16) | ((dig(3) & 0xFFL) << 8) |
        (dig(4) & 0xFFL)
    } else XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offset, len, 42L)

  private[plans] val info =
    new ExpressionInfo(classOf[MinHashShinglesSigExpr].getName, Name)
  private def litVal(e: Expression, what: String): Any = {
    require(e.foldable, s"minhash_sig_arr: $what must be a literal, got $e")
    e.eval(null)
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 3,
      s"minhash_sig_arr expects 3 arguments (shingles, numHashes, portable), " +
        s"got ${children.size}")
    MinHashShinglesSigExpr(children(0),
      litVal(children(1), "numHashes").asInstanceOf[Number].intValue(),
      litVal(children(2), "portable").asInstanceOf[Boolean])
  }

  /** Idempotent per-session registration (the GraftFunctions pattern). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
