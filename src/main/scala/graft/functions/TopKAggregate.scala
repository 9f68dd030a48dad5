package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded max-heap of the k smallest (dist, id) pairs, with deterministic
  * (dist, id) lexicographic tie-break. ~k doubles + k longs per group —
  * the 100TB-safe alternative to rank-over-window KNN: partial aggregation
  * runs map-side, so only num_partitions × k pairs per query ever shuffle
  * (SURVEY.md §7 hard part 6).
  */
final class TopKHeap(val k: Int) {
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def worseThan(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def insert(d: Double, id: Long): Unit = {
    if (size < k) {
      dists(size) = d; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worseThan(dists(0), ids(0), d, id)) {
      dists(0) = d; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worseThan(dists(i), ids(i), dists(p), ids(p))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && worseThan(dists(l), ids(l), dists(m), ids(m))) m = l
      if (r < size && worseThan(dists(r), ids(r), dists(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val d = dists(i); dists(i) = dists(j); dists(j) = d
    val x = ids(i); ids(i) = ids(j); ids(j) = x
  }

  def merge(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { insert(other.dists(i), other.ids(i)); i += 1 }
    this
  }

  /** (dist, id) pairs sorted ascending. */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (dists(i), ids(i)))
    scala.util.Sorting.stableSort(out, (a: (Double, Long), b: (Double, Long)) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

/** topk_pairs(dist, id, k) -> array<struct<dist:double, id:bigint>> sorted by
  * (dist, id) ascending. Used by the KNN join (SURVEY.md W1/J3).
  */
case class TopKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dist", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val d = left.eval(input)
    val id = right.eval(input)
    if (d != null && id != null) {
      buf.insert(d.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = buf.merge(other)

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (d, id) =>
      new GenericInternalRow(Array[Any](d, id))
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.dists(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { heap.insert(bb.getDouble(), bb.getLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  /** Aggregate Column: bounded top-k of (dist, id) per group. */
  def topKPairs(dist: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKPairs(
        Bridge.expression(dist.cast("double")),
        Bridge.expression(id.cast("long")),
        k).toAggregateExpression())
}
