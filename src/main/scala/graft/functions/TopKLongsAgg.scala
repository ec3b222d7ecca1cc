package graft.functions

import java.nio.ByteBuffer
import java.util.PriorityQueue
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Fixed-k top-k aggregate over a packed-BIGINT ordering key: keeps the k
 * largest values in a bounded min-heap per group (k longs per aggregation
 * buffer — CONSTANT state), merges map-side, and emits them sorted
 * descending.
 *
 * This is the aggregate that replaces a `row_number() OVER (PARTITION BY
 * g ORDER BY …) <= k` window for per-group top-k: the window shuffles and
 * sorts EVERY candidate row (|corpus|·|queries| rows for batch ANN); this
 * aggregate reduces each map partition to k longs per group before the
 * shuffle, so only |groups|·k·partitions values cross the wire and
 * nothing is ever sorted but the final k. The caller packs (score,
 * tiebreak, payload) into one BIGINT — see
 * [[graft.operators.Similarity.annTopKBatch]] for the packing recipe —
 * because a fixed-width primitive buffer is what keeps this inside
 * ObjectHashAggregate with map-side partial aggregation (a struct
 * ordering would fall back to SortAggregate).
 */
object TopKLongs {
  def apply(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      TopKLongsAgg(GraftBridge.expression(c), k).toAggregateExpression())
  }
}

case class TopKLongsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"topk_longs k must be positive, got $k")

  override def createAggregationBuffer(): PriorityQueue[java.lang.Long] =
    new PriorityQueue[java.lang.Long](k + 1)

  private def offer(buf: PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v > buf.peek()) { buf.poll(); buf.add(v) }

  override def update(buf: PriorityQueue[java.lang.Long],
                      input: InternalRow): PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: PriorityQueue[java.lang.Long],
                     b2: PriorityQueue[java.lang.Long]): PriorityQueue[java.lang.Long] = {
    b2.forEach(v => offer(b1, v))
    b1
  }

  override def eval(buf: PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = buf.poll(); i -= 1 } // heap pops ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKLongsAgg =
    copy(child = newChild)
  override def prettyName: String = "topk_longs"
}
