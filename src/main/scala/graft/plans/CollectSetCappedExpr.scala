package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_set_capped(member, cap)` — `collect_set` that gives up on
  * hub groups: the distinct set is accumulated only while its size
  * stays ≤ `cap`; the moment a (cap+1)-th distinct member appears the
  * buffer flips to SATURATED, drops its contents, and the group
  * evaluates to NULL.
  *
  * Why it exists (guide §5 bounded per-task state, §2.3 aggregate
  * before you shuffle): every bucketed pair generator in the engine
  * screens out over-cap groups anyway — `filter(size(ms) <= cap)`
  * after the collect, or a separate count-distinct pass joined back
  * before it. The filter-after shape builds the one unspillable array
  * the cap exists to forbid (a hub bucket with millions of members
  * lives in a single aggregation buffer before being thrown away);
  * the count-first shape pays a second full pass over the input. This
  * aggregate is the screen and the collect in ONE pass with the
  * buffer bounded at `cap` elements by construction — partial
  * (map-side) aggregation dedupes and caps per task, so a hub group
  * ships at most cap+ε rows per map task instead of its full fan-in.
  *
  * Exact-equivalence contract (the call sites' results are
  * oracle-pinned): for every group,
  * `collect_set_capped(m, cap) IS NULL ⇔ countDistinct(m) > cap`, and
  * otherwise the array equals `collect_set(m)` up to ordering (nulls
  * ignored, same as collect_set; callers sort with `sort_array` as
  * they did before). Saturation is union-safe: a non-saturated buffer
  * holds the COMPLETE distinct set of its inputs, so the merged size
  * check is exact, and saturation of either side correctly saturates
  * the union.
  *
  * Value semantics mirror Spark's own `Collect` (values copied out of
  * unsafe-backed rows on update; serialize/deserialize through one
  * UnsafeProjection of a nullable array field — NULL array encodes the
  * saturated buffer). Binary and map element types are rejected like
  * collect_set rejects maps (binary because Array[Byte] hashes by
  * reference; no call site needs it). */
case class CollectSetCappedAgg(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectSetCappedAgg.Buffer] {

  require(cap >= 1, s"collect_set_capped: cap must be >= 1, got $cap")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "collect_set_capped"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def bad(dt: DataType): Boolean = dt match {
      case _: MapType | _: BinaryType => true
      case s: StructType => s.fields.exists(f => bad(f.dataType))
      case a: ArrayType => bad(a.elementType)
      case _ => false
    }
    if (bad(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"collect_set_capped does not support ${child.dataType.simpleString}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): CollectSetCappedAgg.Buffer =
    new CollectSetCappedAgg.Buffer(new mutable.HashSet[Any], false)

  override def update(buf: CollectSetCappedAgg.Buffer,
                      input: InternalRow): CollectSetCappedAgg.Buffer = {
    if (!buf.saturated) {
      val v = child.eval(input)
      if (v != null) add(buf, InternalRow.copyValue(v))
    }
    buf
  }

  private def add(buf: CollectSetCappedAgg.Buffer, v: Any): Unit = {
    if (!buf.set.contains(v)) {
      if (buf.set.size >= cap) {
        buf.saturated = true
        buf.set.clear()
      } else buf.set += v
    }
  }

  override def merge(b1: CollectSetCappedAgg.Buffer,
                     b2: CollectSetCappedAgg.Buffer)
      : CollectSetCappedAgg.Buffer = {
    if (b1.saturated || b2.saturated) {
      b1.saturated = true
      b1.set.clear()
    } else {
      val it = b2.set.iterator
      while (!b1.saturated && it.hasNext) add(b1, it.next())
    }
    b1
  }

  override def eval(buf: CollectSetCappedAgg.Buffer): Any =
    if (buf.saturated) null else new GenericArrayData(buf.set.toArray)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))
  private lazy val row = new UnsafeRow(1)

  override def serialize(buf: CollectSetCappedAgg.Buffer): Array[Byte] = {
    val arr = if (buf.saturated) null
      else new GenericArrayData(buf.set.toArray)
    projection.apply(InternalRow.apply(arr)).getBytes()
  }

  override def deserialize(bytes: Array[Byte]): CollectSetCappedAgg.Buffer = {
    val buf = createAggregationBuffer()
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) buf.saturated = true
    else row.getArray(0).foreach(child.dataType, (_, x: Any) => buf.set += x)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectSetCappedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectSetCappedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectSetCappedAgg =
    copy(child = newChildren.head)
}

object CollectSetCappedAgg {
  final class Buffer(val set: mutable.HashSet[Any], var saturated: Boolean)

  val Name = "collect_set_capped"
  private[plans] val info =
    new ExpressionInfo(classOf[CollectSetCappedAgg].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"collect_set_capped expects 2 arguments (member, cap), got " +
        s"${children.size}")
    require(children(1).foldable,
      s"collect_set_capped: cap must be a literal, got ${children(1)}")
    CollectSetCappedAgg(children(0),
      children(1).eval(null).asInstanceOf[Number].intValue())
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
