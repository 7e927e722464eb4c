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
object GraftFunctions {
  val Name = "cosine_sim"
  val LshName = "lsh_buckets"
  private val info =
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, Name)
  private val builder = (children: Seq[Expression]) => {
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

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Same info/builder instances as the per-session registration path,
    // so the two can't drift.
    ext.injectFunction(
      (FunctionIdentifier(GraftFunctions.Name),
       GraftFunctions.cosineInfo, GraftFunctions.cosineBuilder))
    ext.injectFunction(
      (FunctionIdentifier(GraftFunctions.LshName),
       GraftFunctions.lshInfo, GraftFunctions.lshBuilder))
  }
}
