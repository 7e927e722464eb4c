package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression computing every hash table's sign-LSH
  * bucket id for one vector in a single fused loop.
  *
  * Semantics are exactly [[graft.llm.Similarity.lshBucket]] evaluated
  * for tables 0..tables-1: plane p of table t uses the ±1 hyperplane
  * whose component i has sign +1 iff `xxhash64(t, p, i)` (Spark's
  * XxHash64 over three int columns, seed 42) is odd, and bit p of the
  * bucket is set iff the signed projection is > 0. The sign matrix is
  * precomputed once driver-side (tables×planes×dim doubles) and shipped
  * as a codegen reference object — the per-row HOF form re-derives every
  * sign with an interpreted xxhash64 call per (table, plane, component)
  * per row, which dominates the whole LSH stage.
  *
  * Accumulation is sequential over components in index order, matching
  * the HOF `aggregate` fold, so bucket assignments are bit-identical to
  * the Column formulation. Vectors shorter than `dim` differ: the HOF
  * form nulls the whole projection (zip_with pads), this form projects
  * the prefix; inputs here are fixed-dim embeddings, so the case never
  * arises in practice.
  */
case class SignLshBucketsExpr(child: Expression, tables: Int, planes: Int,
                              dim: Int)
    extends UnaryExpression {

  // Bucket bits live in an Int: planes > 31 would alias (1 << 32 == 1
  // in JVM int arithmetic) and silently collide hyperplanes.
  require(tables > 0 && dim > 0 && planes > 0 && planes <= 31,
    s"lsh_buckets: need tables>0, dim>0, 0<planes<=31; got " +
      s"tables=$tables planes=$planes dim=$dim")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  /** signs(((t*planes)+p)*dim + i) = ±1.0, derived from Spark's
    * xxhash64(t, p, i) with the default seed 42 (int inputs hash through
    * the 4-byte path). */
  @transient private lazy val signs: Array[Double] = {
    val out = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      val ht = XXH64.hashInt(t, 42L)
      var p = 0
      while (p < planes) {
        val hp = XXH64.hashInt(p, ht)
        var i = 0
        while (i < dim) {
          out((t * planes + p) * dim + i) =
            if ((XXH64.hashInt(i, hp) & 1L) == 1L) 1.0 else -1.0
          i += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }

  private def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : Array[Int] = {
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += arr.getFloat(i).toDouble * signs(base + i)
          i += 1
        }
        if (acc > 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $base = ($t * $planes + $p) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $a.getFloat($i) * $signsRef[$base + $i];
         |    }
         |    if ($acc > 0) $bucket |= (1 << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignLshBucketsExpr = copy(child = newChild)
}
