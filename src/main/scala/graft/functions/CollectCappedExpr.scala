package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Bounded distinct-collect: `graft_collect_capped(v, cap)` returns the
  * SORTED distinct long values of the group as array<bigint>, or NULL if
  * the group's distinct count exceeds `cap`.
  *
  * The point is the state bound: `collect_set` materializes every
  * distinct value before any size filter can run, so one hot group (a
  * boilerplate shingle shared by millions of documents) holds millions
  * of entries in a single aggregation buffer — the OOM that kills
  * DF-capped index builds at corpus scale. This aggregate's buffer never
  * exceeds cap+1 entries: once a partial sees cap+1 distinct values it
  * collapses to an overflow marker (1 byte), and merging an overflowed
  * partial overflows the result. Group-size filtering therefore costs
  * ONE shuffle with O(cap) state — no pre-pass to find hot keys, no
  * anti-join, and map-side partial aggregation still applies.
  *
  * Exactness: if the true distinct count ≤ cap, no partial can ever see
  * more than cap+1 values, so every partial is exact and the merged
  * result is the exact sorted set. If it exceeds cap, SOME merge chain
  * reaches cap+1 and the group yields NULL — exactly the "drop hot keys"
  * semantics of a DF > τ filter.
  */
case class CollectCappedExpr(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCappedExpr.CappedSet] {

  import CollectCappedExpr.CappedSet

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // ExpectsInputTypes is private[sql] in Spark 4 — hand-rolled check.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && cap > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_collect_capped needs a BIGINT column and a positive integer cap, " +
        s"got ${child.dataType.simpleString} / $cap")

  override def createAggregationBuffer(): CappedSet = new CappedSet(cap)

  override def update(b: CappedSet, input: InternalRow): CappedSet = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedSet, o: CappedSet): CappedSet = { b.mergeIn(o); b }

  override def eval(b: CappedSet): Any =
    if (b.overflowed) null
    else {
      val arr = new Array[Long](b.set.size())
      val it = b.set.iterator() // TreeSet: ascending
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new GenericArrayData(arr)
    }

  override def serialize(b: CappedSet): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 8 * b.set.size())
    buf.put(if (b.overflowed) 1.toByte else 0.toByte)
    buf.putInt(b.set.size())
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedSet = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new CappedSet(cap)
    val over = buf.get() == 1.toByte
    if (over) b.overflowed = true
    else {
      val n = buf.getInt
      var i = 0
      while (i < n) { b.add(buf.getLong); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): CollectCappedExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CollectCappedExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CollectCappedExpr =
    copy(child = c.head)
  override def prettyName: String = "graft_collect_capped"
}

object CollectCappedExpr {
  /** ≤ cap+1 distinct longs or a 1-byte overflow marker — never more. */
  final class CappedSet(cap: Int) {
    var overflowed: Boolean = false
    val set = new java.util.TreeSet[java.lang.Long]()
    def add(v: Long): Unit =
      if (!overflowed) {
        set.add(v)
        if (set.size() > cap) { overflowed = true; set.clear() }
      }
    def mergeIn(o: CappedSet): Unit =
      if (o.overflowed) { overflowed = true; set.clear() }
      else {
        val it = o.set.iterator()
        while (it.hasNext && !overflowed) add(it.next())
      }
  }
}
