package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Bounded k-minimum-values collect: `graft_kmin(v, k)` returns the k
  * SMALLEST distinct long values of the group as a sorted array<bigint>
  * (fewer if the group has fewer distinct values).
  *
  * This is the state kernel of the KMV distinct-count sketch
  * (Bar-Yossef et al. 2002): hash each element to a uniform long, keep
  * the k smallest distinct hashes, estimate the distinct count as
  * (k-1) · RANGE / kth-min. The aggregate itself is exact-k-min and
  * fully mergeable, so it runs as a map-side partial: every partial
  * buffer holds ≤ k longs no matter how many rows or how hot the group
  * — at 100 TB the shuffle carries k·8 bytes per (group, partition)
  * instead of the full distinct set that `collect_set` would ship
  * (`approx_count_distinct` is the built-in alternative, but its HLL++
  * buckets are engine-specific; KMV over an md5-derived hash is
  * bit-reproducible in any engine, which is what lets a DuckDB oracle
  * hash-check the estimate itself — see SketchQueries).
  */
case class KMinExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinExpr.KMinSet] {

  import KMinExpr.KMinSet

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmin needs a BIGINT column and a positive integer k, " +
        s"got ${child.dataType.simpleString} / $k")

  override def createAggregationBuffer(): KMinSet = new KMinSet(k)

  override def update(b: KMinSet, input: InternalRow): KMinSet = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KMinSet, o: KMinSet): KMinSet = { b.mergeIn(o); b }

  override def eval(b: KMinSet): Any = {
    val arr = new Array[Long](b.set.size())
    val it = b.set.iterator() // TreeSet: ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: KMinSet): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.set.size())
    buf.putInt(b.set.size())
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinSet = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new KMinSet(k)
    val n = buf.getInt
    var i = 0
    while (i < n) { b.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KMinExpr =
    copy(child = c.head)
  override def prettyName: String = "graft_kmin"
}

object KMinExpr {
  /** The k smallest distinct longs seen so far — never more than k. */
  final class KMinSet(k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def add(v: Long): Unit = {
      // Cheap reject before the insert: full buffer and v >= current max.
      if (set.size() == k && v >= set.last()) return
      set.add(v)
      if (set.size() > k) set.pollLast()
    }
    def mergeIn(o: KMinSet): Unit = {
      val it = o.set.iterator()
      while (it.hasNext) add(it.next())
    }
  }
}
