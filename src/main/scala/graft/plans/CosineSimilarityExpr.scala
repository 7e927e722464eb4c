package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for cosine similarity over two
  * array<float> columns, with `doGenCode` — the one hot-path scalar
  * where the built-in route (zip_with + aggregate higher-order
  * functions) interprets a lambda per element and breaks whole-stage
  * codegen. The generated code is a single fused float loop.
  *
  * Accumulation order is sequential left-to-right, bit-identical to
  * the HOF formulation in [[graft.llm.Similarity.cosine]], so swapping
  * one for the other never changes results.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // (ExpectsInputTypes is package-private API in Spark 4; inputs are
  // validated here instead.) Each side is independently float or
  // double; every element routes through the same double accumulator,
  // so a float side is bit-identical to the HOF form's
  // `x.cast("double")` and a double side to the plain HOF read — the
  // k-means paths pair a float corpus with double centroid means.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double|bigint> sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // Per-side element reader, always into the double accumulator —
  // float matches the HOF form's x.cast("double") bit for bit, long
  // (the integer-quantized twin inputs, |x| < 2^24 ≪ 2^53) is the
  // exact widening the HOF cast performs too.
  private def readerOf(e: Expression): (String, String) = e.dataType match {
    case ArrayType(DoubleType, _) => ("getDouble", "")
    case ArrayType(LongType, _) => ("getLong", "(double) ")
    case _ => ("getFloat", "(double) ")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // A zero-norm side yields NULL, matching the HOF form exactly:
  // Spark's Divide returns NULL on a zero divisor, while raw Java
  // division would give NaN — and NaN sorts ABOVE every real similarity
  // in a descending top-k, which would silently promote zero/empty
  // vectors to rank 1.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    def rd(arr: org.apache.spark.sql.catalyst.util.ArrayData,
           side: Expression, i: Int): Double = side.dataType match {
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case ArrayType(LongType, _) => arr.getLong(i).toDouble
      case _ => arr.getFloat(i).toDouble
    }
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = rd(xs, left, i)
      val y = rd(ys, right, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      def rd(arr: String, side: Expression) = {
        val (m, cast) = readerOf(side)
        s"$cast$arr.$m($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${rd(a, left)};
         |  double $y = ${rd(b, right)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance over two numeric-array columns — the PQ
  * training/lookup metric, as one fused loop with `doGenCode`.
  * Bit-identical to the HOF form
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  * (same left-to-right accumulation in double), so swapping one for
  * the other never changes codes, ADC sums, or ranks — the PQ paths
  * evaluate this corpus × m × k times, the hottest loop of
  * encode/training. Same per-side float/double/bigint acceptance as
  * [[CosineSimilarityExpr]]. Mismatched lengths score over the common
  * prefix (the HOF's zip_with would null out — callers guard shape
  * via requireCodebook, which fails loudly first). */
case class L2SquaredExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects array<float|double|bigint> sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    def rd(arr: org.apache.spark.sql.catalyst.util.ArrayData,
           side: Expression, i: Int): Double = side.dataType match {
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case ArrayType(LongType, _) => arr.getLong(i).toDouble
      case _ => arr.getFloat(i).toDouble
    }
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = rd(xs, left, i) - rd(ys, right, i)
      acc += d * d
      i += 1
    }
    acc
  }

  private def readerOf(e: Expression): (String, String) = e.dataType match {
    case ArrayType(DoubleType, _) => ("getDouble", "")
    case ArrayType(LongType, _) => ("getLong", "(double) ")
    case _ => ("getFloat", "(double) ")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def rd(arr: String, side: Expression) = {
        val (m, cast) = readerOf(side)
        s"$cast$arr.$m($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${rd(a, left)} - ${rd(b, right)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SquaredExpr =
    copy(left = newLeft, right = newRight)
}

/** Function registration: per-session (idempotent) or via the
  * `spark.sql.extensions` mechanism with [[GraftExtensions]]. */
/** Argmax-cosine centroid assignment as ONE scalar expression: the
  * whole broadcast-sized centroid matrix rides in as two literals
  * (flattened doubles + cluster ids) and each corpus row is assigned
  * in a single eval — replacing assignToCentroids' corpus × k
  * cross-join + 8 M-row shuffle + per-row lpad-string min_by key with
  * pure scan work (the d17/e7/e12 k-means hot path).
  *
  * Bit-identical to the replaced form
  * `min_by(cluster, struct(-cosine, lpad(cluster, 24, '0')))`:
  * per-centroid similarity uses [[CosineSimilarityExpr]]'s exact
  * accumulation (sequential double, vector norm hoisted — the same
  * bits, it never depends on the centroid), centroids are visited in
  * lpad-24 order with strict-improvement updates (ties keep the
  * smallest padded id), and a NULL similarity (zero-norm side) sorts
  * BEFORE every real one exactly as a null struct field does in
  * min_by's ordering. Registered as
  * `nearest_centroid(vec, ids, flat, dim)`. */
case class NearestCentroidExpr(child: Expression, ids: Array[String],
                               flat: Array[Double], dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects a numeric array vector, got " +
            s"${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "nearest_centroid"

  // Visit order = ascending padded id, so the FIRST strict winner is
  // min_by's tie choice. Padding and comparison follow Spark exactly:
  // lpad counts CODE POINTS and UTF8String orders by UTF-8 BYTES —
  // Java String length/compareTo (UTF-16 code units) diverge on
  // supplementary-plane ids and would flip tie-breaks against the
  // pinned min_by form.
  private lazy val order: Array[Int] =
    NearestCentroidExpr.utf8PaddedOrder(ids)
  private lazy val idsUtf8 =
    ids.map(org.apache.spark.unsafe.types.UTF8String.fromString)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val isDouble = child.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val isLong = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val nv = v.numElements()
    // Vector norm: same left-to-right double accumulation as the
    // pairwise expression; independent of the centroid, so hoisting
    // changes no bits. Computed over min(nv, dim) elements — the
    // pairwise form's length contract.
    val n = math.min(nv, dim)
    @inline def rd(i: Int): Double =
      if (isDouble) v.getDouble(i)
      else if (isLong) v.getLong(i).toDouble
      else v.getFloat(i).toDouble
    var na = 0.0
    var i = 0
    while (i < n) { val x = rd(i); na += x * x; i += 1 }
    val sqna = math.sqrt(na)
    var best = -1
    var bestSim = 0.0
    var bestNull = false
    var o = 0
    while (o < order.length) {
      val j = order(o)
      var dot = 0.0; var nb = 0.0
      var p = 0
      val off = j * dim
      while (p < n) {
        val x = rd(p); val y = flat(off + p)
        dot += x * y; nb += y * y
        p += 1
      }
      // Tail of the centroid beyond the vector's length still feeds
      // its norm in the pairwise form? No: the pairwise loop runs to
      // min(len) on BOTH accumulators — nb over n matches exactly.
      val denom = sqna * math.sqrt(nb)
      val simNull = denom == 0.0
      val sim = if (simNull) 0.0 else dot / denom
      val better =
        if (best == -1) true
        else if (simNull) !bestNull
        else if (bestNull) false
        else sim > bestSim
      if (better) { best = j; bestSim = sim; bestNull = simNull }
      o += 1
    }
    if (best == -1) null else idsUtf8(best)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidExpr = copy(child = newChild)

  // Array-typed constructor fields: structural equality/hash by value
  // so plan canonicalization doesn't treat identical literals as
  // distinct (Arrays compare by reference by default).
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroidExpr =>
      child == o.child && dim == o.dim &&
        java.util.Arrays.equals(ids.asInstanceOf[Array[AnyRef]],
          o.ids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim),
      Int.box(java.util.Arrays.hashCode(flat)))
}

object NearestCentroidExpr {
  val Name = "nearest_centroid"
  private[plans] val info =
    new ExpressionInfo(classOf[NearestCentroidExpr].getName, Name)

  /** `lpad(s, 24, '0')` with Spark's semantics: length in CODE POINTS
    * (Java String.length counts UTF-16 units and would mis-pad
    * supplementary-plane ids). */
  private[plans] def lpad24(s: String): String = {
    val n = s.codePointCount(0, s.length)
    if (n >= 24) s.substring(0, s.offsetByCodePoints(0, 24))
    else ("0" * (24 - n)) + s
  }

  /** Indices of `ids` sorted by lpad24(id) in UTF-8 BYTE order — the
    * exact ordering `min_by(struct(-sim, lpad(id, 24, '0')))` applies
    * (UTF8String compares bytes, i.e. code points; Java compareTo
    * orders UTF-16 code units, which diverges for ids mixing
    * supplementary and high-BMP characters). */
  private[graft] def utf8PaddedOrder(ids: Array[String]): Array[Int] = {
    val padded = ids.map(i =>
      lpad24(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ids.indices.sortWith((a, b) =>
      java.util.Arrays.compareUnsigned(padded(a), padded(b)) < 0).toArray
  }
  private def litArray(e: Expression, what: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, s"nearest_centroid: $what must be a literal")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 4,
      s"nearest_centroid expects 4 arguments (vec, ids, flat, dim), " +
        s"got ${children.size}")
    val ids = litArray(children(1), "ids").toArray[
      org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
    val flat = litArray(children(2), "flat")
      .toDoubleArray()
    require(children(3).foldable, "nearest_centroid: dim must be a literal")
    val dim = children(3).eval(null).asInstanceOf[Number].intValue()
    require(dim > 0 && ids.length * dim == flat.length,
      s"nearest_centroid: ${ids.length} ids × dim $dim != ${flat.length}")
    NearestCentroidExpr(children(0), ids, flat, dim)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** TWO-LEVEL argmax-cosine centroid assignment — the large-k path of
  * [[NearestCentroidExpr]]: the centroid table is itself clustered
  * into ~√k coarse cells (driver-local, see
  * [[graft.llm.Similarity.assignToCentroidsTwoLevel]]); each corpus
  * row scores the coarse centroids, probes its `nprobe` best cells,
  * and runs the fine argmax over only their members. Per-row work
  * drops from O(k·dim) to O((√k + nprobe·k/√k)·dim) — the term that
  * made brute assignment quadratic under the SemDeDup k ∝ corpus
  * regime (assignment is the inner loop of every Lloyd iteration AND
  * the full-corpus pass).
  *
  * Approximate BY DESIGN (the true argmax can live in an unprobed
  * cell — the standard IVF trade, recall tunable via nprobe), but
  * exact in every degenerate case the brute comparator pins:
  * a zero-norm input vector and the all-null-sims path return the
  * globally smallest padded id; a zero-norm CENTROID (null sim sorts
  * before every real one in the min_by ordering) wins regardless of
  * probing; a vector whose length differs from `dim` falls back to
  * the full brute scan (partial-norm semantics are length-dependent
  * and not precomputable). With nprobe ≥ the cell count the probe is
  * total and the result is bit-identical to brute — the equivalence
  * the spec pins. Ties and visit order use the same UTF-8-byte padded
  * ordering as the brute expression. Registered as
  * `nearest_centroid_2l(vec, ids, flat, dim, coarseFlat, cellOf,
  * nprobe)`. */
case class NearestCentroidTwoLevelExpr(
    child: Expression, ids: Array[String], flat: Array[Double], dim: Int,
    coarseFlat: Array[Double], cellOf: Array[Int], nprobe: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_2l expects a numeric array vector, got " +
            s"${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "nearest_centroid_2l"

  private lazy val idsUtf8 =
    ids.map(org.apache.spark.unsafe.types.UTF8String.fromString)
  private lazy val paddedBytes: Array[Array[Byte]] =
    ids.map(i => NearestCentroidExpr.lpad24(i)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private lazy val order: Array[Int] =
    NearestCentroidExpr.utf8PaddedOrder(ids)
  // Globally smallest padded id — the all-null-sims winner.
  private lazy val minPaddedIdx: Int = order.head
  // Precomputed fine-centroid norms (valid only for dim-length
  // vectors, the non-fallback path).
  private lazy val fineNorms: Array[Double] = {
    val out = new Array[Double](ids.length)
    var j = 0
    while (j < ids.length) {
      var nb = 0.0; var p = 0; val off = j * dim
      while (p < dim) { val y = flat(off + p); nb += y * y; p += 1 }
      out(j) = math.sqrt(nb)
      j += 1
    }
    out
  }
  // Smallest-padded zero-norm fine centroid, or -1: its NULL
  // similarity sorts before every real one in the pinned min_by
  // ordering, so when one exists it wins every assignment.
  private lazy val zeroNormHead: Int =
    order.find(j => fineNorms(j) == 0.0).getOrElse(-1)
  private lazy val coarseK: Int = coarseFlat.length / dim
  private lazy val coarseNorms: Array[Double] = {
    val out = new Array[Double](coarseK)
    var c = 0
    while (c < coarseK) {
      var nb = 0.0; var p = 0; val off = c * dim
      while (p < dim) { val y = coarseFlat(off + p); nb += y * y; p += 1 }
      out(c) = math.sqrt(nb)
      c += 1
    }
    out
  }
  // Members per coarse cell, each cell's members in padded-id order so
  // the first strict winner within a cell is the tie choice.
  private lazy val cells: Array[Array[Int]] = {
    val buf = Array.fill(coarseK)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    order.foreach(j => buf(cellOf(j)) += j)
    buf.map(_.toArray)
  }

  private lazy val typeTag: Int = child.dataType match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(LongType, _) => 1
    case _ => 2
  }
  // One primitive copy per eval, then every dot product runs on plain
  // double[] — the per-element ArrayData virtual call would otherwise
  // dominate the (√k + nprobe·k/√k) loop this expression exists to
  // shrink.
  private def copyVec(v: org.apache.spark.sql.catalyst.util.ArrayData,
                      n: Int): Array[Double] = {
    val q = new Array[Double](n)
    var i = 0
    typeTag match {
      case 0 => while (i < n) { q(i) = v.getDouble(i); i += 1 }
      case 1 => while (i < n) { q(i) = v.getLong(i).toDouble; i += 1 }
      case _ => while (i < n) { q(i) = v.getFloat(i).toDouble; i += 1 }
    }
    q
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nv = v.numElements()
    if (nv != dim) return bruteEval(v, nv)
    val rd = copyVec(v, dim)
    var na = 0.0
    var i = 0
    while (i < dim) { val x = rd(i); na += x * x; i += 1 }
    if (na == 0.0) return idsUtf8(minPaddedIdx)
    if (zeroNormHead >= 0) return idsUtf8(zeroNormHead)
    val sqna = math.sqrt(na)
    // Coarse probe: top-nprobe cells by (sim desc, cell asc) —
    // selection over a bounded candidate array (coarseK ≈ √k).
    val np = math.min(nprobe, coarseK)
    val bestCells = new Array[Int](np)
    val bestSims = new Array[Double](np)
    var filled = 0
    var c = 0
    while (c < coarseK) {
      var dot = 0.0; var p = 0; val off = c * dim
      while (p < dim) { dot += rd(p) * coarseFlat(off + p); p += 1 }
      // A zero-norm coarse centroid carries no direction: rank below
      // every real similarity (sim ∈ [-1, 1]) but stay probeable when
      // cells are scarce.
      val sim = if (coarseNorms(c) == 0.0) -2.0
        else dot / (sqna * coarseNorms(c))
      // Insertion position: strictly-better sims displace; equal sims
      // keep the earlier (smaller) cell index.
      var pos = filled
      while (pos > 0 && bestSims(pos - 1) < sim) pos -= 1
      if (pos < np) {
        val upto = math.min(filled, np - 1)
        var q = upto
        while (q > pos) {
          bestSims(q) = bestSims(q - 1); bestCells(q) = bestCells(q - 1)
          q -= 1
        }
        bestSims(pos) = sim; bestCells(pos) = c
        if (filled < np) filled += 1
      }
      c += 1
    }
    // Fine argmax within probed cells: same strict-improvement update
    // as brute, tie to the smallest padded id via explicit comparison
    // (cells are visited in probe order, not padded order).
    var best = -1
    var bestSim = 0.0
    var pc = 0
    while (pc < filled) {
      val members = cells(bestCells(pc))
      var mi = 0
      while (mi < members.length) {
        val j = members(mi)
        var dot = 0.0; var p = 0; val off = j * dim
        while (p < dim) { dot += rd(p) * flat(off + p); p += 1 }
        val sim = dot / (sqna * fineNorms(j))
        val better =
          if (best == -1) true
          else if (sim != bestSim) sim > bestSim
          else java.util.Arrays.compareUnsigned(
            paddedBytes(j), paddedBytes(best)) < 0
        if (better) { best = j; bestSim = sim }
        mi += 1
      }
      pc += 1
    }
    if (best == -1) null else idsUtf8(best)
  }

  /** The exact brute comparator over ALL centroids — the fallback for
    * vectors whose length differs from `dim`, where partial-norm
    * semantics depend on the input length and the precomputed norms
    * don't apply. Mirrors [[NearestCentroidExpr.nullSafeEval]]. */
  private def bruteEval(v: org.apache.spark.sql.catalyst.util.ArrayData,
                        nv: Int): Any = {
    val n = math.min(nv, dim)
    val rd = copyVec(v, n)
    var na = 0.0
    var i = 0
    while (i < n) { val x = rd(i); na += x * x; i += 1 }
    val sqna = math.sqrt(na)
    var best = -1
    var bestSim = 0.0
    var bestNull = false
    var o = 0
    while (o < order.length) {
      val j = order(o)
      var dot = 0.0; var nb = 0.0
      var p = 0
      val off = j * dim
      while (p < n) {
        val x = rd(p); val y = flat(off + p)
        dot += x * y; nb += y * y
        p += 1
      }
      val denom = sqna * math.sqrt(nb)
      val simNull = denom == 0.0
      val sim = if (simNull) 0.0 else dot / denom
      val better =
        if (best == -1) true
        else if (simNull) !bestNull
        else if (bestNull) false
        else sim > bestSim
      if (better) { best = j; bestSim = sim; bestNull = simNull }
      o += 1
    }
    if (best == -1) null else idsUtf8(best)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidTwoLevelExpr =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroidTwoLevelExpr =>
      child == o.child && dim == o.dim && nprobe == o.nprobe &&
        java.util.Arrays.equals(ids.asInstanceOf[Array[AnyRef]],
          o.ids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(flat, o.flat) &&
        java.util.Arrays.equals(coarseFlat, o.coarseFlat) &&
        java.util.Arrays.equals(cellOf, o.cellOf)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim), Int.box(nprobe),
      Int.box(java.util.Arrays.hashCode(flat)),
      Int.box(java.util.Arrays.hashCode(coarseFlat)),
      Int.box(java.util.Arrays.hashCode(cellOf)))
}

object NearestCentroidTwoLevelExpr {
  val Name = "nearest_centroid_2l"
  private[plans] val info =
    new ExpressionInfo(classOf[NearestCentroidTwoLevelExpr].getName, Name)
  private def litArray(e: Expression, what: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, s"$Name: $what must be a literal")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
  }
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$Name: $what must be a literal")
    e.eval(null).asInstanceOf[Number].intValue()
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 7,
      s"$Name expects 7 arguments (vec, ids, flat, dim, coarseFlat, " +
        s"cellOf, nprobe), got ${children.size}")
    val ids = litArray(children(1), "ids").toArray[
      org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
    val flat = litArray(children(2), "flat").toDoubleArray()
    val dim = litInt(children(3), "dim")
    val coarseFlat = litArray(children(4), "coarseFlat").toDoubleArray()
    val cellOf = litArray(children(5), "cellOf").toIntArray()
    val nprobe = litInt(children(6), "nprobe")
    require(dim > 0 && ids.length * dim == flat.length,
      s"$Name: ${ids.length} ids × dim $dim != ${flat.length}")
    require(coarseFlat.length % dim == 0 && coarseFlat.length > 0,
      s"$Name: coarse matrix length ${coarseFlat.length} not a " +
        s"multiple of dim $dim")
    val coarseK = coarseFlat.length / dim
    require(cellOf.length == ids.length &&
        cellOf.forall(c => c >= 0 && c < coarseK),
      s"$Name: cellOf must map every centroid to a coarse cell")
    require(nprobe >= 1, s"$Name: nprobe must be >= 1")
    NearestCentroidTwoLevelExpr(children(0), ids, flat, dim, coarseFlat,
      cellOf, nprobe)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Whole-vector PQ encoding as ONE scalar expression: all m nearest-
  * codeword searches in a single eval against a literal codebook —
  * replacing the corpus-side subvector explode (×m) + broadcast join
  * (×k) + two shuffle aggregations of the declarative encode with
  * pure scan work (the e9/e12 corpus-encode hot path; PQ TRAINING
  * keeps the declarative join — its input is a bounded sample and its
  * iteration structure needs the (id, subspace) frame anyway).
  *
  * Bit-identical to
  * `min_by(code, struct(l2sq(sv, centroid), code))` per subspace:
  * distances use [[L2SquaredExpr]]'s exact left-to-right double fold
  * over min(len) elements, codewords are visited in ascending code
  * order with strict-improvement updates (ties keep the smallest
  * code), and subspaces whose codewords vanished from the codebook
  * (empty Lloyd clusters) simply have fewer candidates — exactly the
  * rows the join would have had. Registered as
  * `pq_codes(vec, counts, codes, flat, sub)`; the codebook arrives
  * flattened in (subspace asc, code asc, pos) order. */
case class PqCodesExpr(child: Expression, counts: Array[Int],
                       codeVals: Array[Int], flat: Array[Double], sub: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes expects a numeric array vector, got " +
            s"${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  // Start offset of subspace j's first codeword in `flat` /
  // `codeVals`.
  private lazy val codeStart: Array[Int] =
    counts.scanLeft(0)(_ + _).init

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val isDouble = child.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val isLong = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    @inline def rd(i: Int): Double =
      if (isDouble) v.getDouble(i)
      else if (isLong) v.getLong(i).toDouble
      else v.getFloat(i).toDouble
    val nv = v.numElements()
    val m = counts.length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      // Subvector j = elements [j*sub, j*sub+sub) of the vector;
      // shorter when the vector runs out (slice semantics), and the
      // distance folds over min(svLen, sub) like the pairwise l2_sq.
      val svOff = j * sub
      val svLen = math.max(0, math.min(nv - svOff, sub))
      var best = -1
      var bestD = 0.0
      var c = codeStart(j)
      val end = codeStart(j) + counts(j)
      while (c < end) {
        var d = 0.0
        var p = 0
        val off = c * sub
        while (p < svLen) {
          val t = rd(svOff + p) - flat(off + p)
          d += t * t
          p += 1
        }
        if (best == -1 || d < bestD) { best = c; bestD = d }
        c += 1
      }
      // A subspace with NO surviving codewords would have produced no
      // row in the declarative groupBy — fail loudly instead of
      // emitting a fabricated code (cannot happen with a codebook that
      // passed requireCodebook).
      require(best >= 0, s"pq_codes: subspace $j has no codewords")
      out(j) = codeVals(best)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCodesExpr = copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: PqCodesExpr =>
      child == o.child && sub == o.sub &&
        java.util.Arrays.equals(counts, o.counts) &&
        java.util.Arrays.equals(codeVals, o.codeVals) &&
        java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(sub),
      Int.box(java.util.Arrays.hashCode(flat)))
}

object PqCodesExpr {
  val Name = "pq_codes"
  private[plans] val info = new ExpressionInfo(classOf[PqCodesExpr].getName, Name)
  private def litArr(e: Expression, what: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, s"pq_codes: $what must be a literal")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
  }
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 5,
      s"pq_codes expects 5 arguments (vec, counts, codes, flat, sub), " +
        s"got ${children.size}")
    val counts = litArr(children(1), "counts").toIntArray()
    val codes = litArr(children(2), "codes").toIntArray()
    val flat = litArr(children(3), "flat").toDoubleArray()
    require(children(4).foldable, "pq_codes: sub must be a literal")
    val sub = children(4).eval(null).asInstanceOf[Number].intValue()
    require(sub > 0 && counts.sum == codes.length &&
      codes.length * sub == flat.length,
      s"pq_codes: inconsistent codebook shape (${counts.sum} codewords, " +
        s"${codes.length} codes, ${flat.length} values, sub $sub)")
    PqCodesExpr(children(0), counts, codes, flat, sub)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

object GraftFunctions {
  val Name = "cosine_sim"
  val LshName = "lsh_buckets"
  private[plans] val info =
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"cosine_sim expects 2 arguments, got ${children.size}")
    CosineSimilarityExpr(children(0), children(1))
  }
  private[plans] val lshInfo =
    new ExpressionInfo(classOf[SignLshBucketsExpr].getName, LshName)
  private def litInt(e: Expression): Int = {
    require(e.foldable,
      s"lsh_buckets: tables/planes/dim must be integer literals, got $e")
    e.eval(null).asInstanceOf[Number].intValue()
  }
  // lsh_buckets(vec, tables, planes, dim) — the last three must be
  // integer literals (the sign matrix is built at plan time).
  private[plans] val lshBuilder = (children: Seq[Expression]) => {
    require(children.size == 4,
      s"lsh_buckets expects 4 arguments (vec, tables, planes, dim), got ${children.size}")
    SignLshBucketsExpr(children(0), litInt(children(1)),
      litInt(children(2)), litInt(children(3)))
  }
  private[plans] val cosineInfo = info
  private[plans] val cosineBuilder = builder

  val L2Name = "l2_sq"
  private[plans] val l2Info =
    new ExpressionInfo(classOf[L2SquaredExpr].getName, L2Name)
  private[plans] val l2Builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"l2_sq expects 2 arguments, got ${children.size}")
    L2SquaredExpr(children(0), children(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(LshName), lshInfo, lshBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(L2Name), l2Info, l2Builder)
  }
}

/** The WHOLE native-function surface as a session extension:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` makes
  * every graft expression available to plain `spark.sql(...)` on every
  * session of the application — the idiomatic deployment path, vs the
  * operators' own lazy per-session `register()` calls (kept; the two
  * share the same info/builder instances so they cannot drift). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.All.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  type Reg = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)
  private def reg(name: String, info: ExpressionInfo,
                  builder: Seq[Expression] => Expression): Reg =
    (FunctionIdentifier(name), info, builder)

  /** Every registered native function (similarity, dedup signatures,
    * funnel gates, media codecs) — one list, one truth. */
  val All: Seq[Reg] = Seq(
    reg(GraftFunctions.Name, GraftFunctions.cosineInfo,
      GraftFunctions.cosineBuilder),
    reg(GraftFunctions.LshName, GraftFunctions.lshInfo,
      GraftFunctions.lshBuilder),
    reg(GraftFunctions.L2Name, GraftFunctions.l2Info,
      GraftFunctions.l2Builder),
    reg(NearestCentroidExpr.Name, NearestCentroidExpr.info,
      NearestCentroidExpr.builder),
    reg(NearestCentroidTwoLevelExpr.Name, NearestCentroidTwoLevelExpr.info,
      NearestCentroidTwoLevelExpr.builder),
    reg(PqCodesExpr.Name, PqCodesExpr.info, PqCodesExpr.builder),
    reg(MinHashShinglesSigExpr.Name, MinHashShinglesSigExpr.info,
      MinHashShinglesSigExpr.builder),
    reg(MinHashBandsExpr.Name, MinHashBandsExpr.info,
      MinHashBandsExpr.builder),
    reg(MinHashOphSigExpr.Name, MinHashOphSigExpr.info,
      MinHashOphSigExpr.builder),
    reg(TokensDistinctExpr.Name, TokensDistinctExpr.info,
      TokensDistinctExpr.builder),
    reg(TokensDistinctHashedExpr.Name, TokensDistinctHashedExpr.info,
      TokensDistinctHashedExpr.builder),
    reg(SimHashExpr.Name, SimHashExpr.info, SimHashExpr.builder),
    reg(ArrayIntersectSizeExpr.Name, ArrayIntersectSizeExpr.info,
      ArrayIntersectSizeExpr.builder),
    reg(FunnelGatesExpr.Name, FunnelGatesExpr.info, FunnelGatesExpr.builder),
    reg(HtmlExtractExpr.Name, HtmlExtractExpr.info, HtmlExtractExpr.builder),
    reg(TextDecodeExpr.Name, TextDecodeExpr.info, TextDecodeExpr.builder),
    reg(PdfTextExpr.Name, PdfTextExpr.info, PdfTextExpr.builder),
    reg(PdfSynthExpr.Name, PdfSynthExpr.info, PdfSynthExpr.builder),
    reg(NgramHashesExpr.Name, NgramHashesExpr.info, NgramHashesExpr.builder),
    reg(ImageMeanPoolExpr.Name, ImageMeanPoolExpr.info,
      ImageMeanPoolExpr.builder),
    reg(ImageDimsExpr.Name, ImageDimsExpr.info, ImageDimsExpr.builder),
    reg(PngSynthExpr.Name, PngSynthExpr.info, PngSynthExpr.builder),
    reg(JpegSynthExpr.Name, JpegSynthExpr.info, JpegSynthExpr.builder),
    reg(AudioMeanPoolExpr.Name, AudioMeanPoolExpr.info,
      AudioMeanPoolExpr.builder),
    reg(AudioStatsExpr.Name, AudioStatsExpr.info, AudioStatsExpr.builder),
    reg(VideoMetaExpr.Name, VideoMetaExpr.info, VideoMetaExpr.builder),
    reg(VideoFramePoolExpr.Name, VideoFramePoolExpr.info,
      VideoFramePoolExpr.builder),
    reg(AviSynthExpr.Name, AviSynthExpr.info, AviSynthExpr.builder),
    reg(MovSynthExpr.Name, MovSynthExpr.info, MovSynthExpr.builder),
    reg(WavSynthExpr.Name, WavSynthExpr.info, WavSynthExpr.builder))
}
