package graft.sources.xvec

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Columnar (vectorized) partition reader for the xvec scan: decodes straight
  * into `OnHeapColumnVector`s, one `ColumnarBatch` per ~4MB read. Spark
  * inserts the ColumnarToRow transition and whole-stage codegen consumes the
  * batch loop-fused — on scan-bound pipelines this removes the per-record
  * `GenericInternalRow` allocation + UnsafeArrayData copy of the row reader
  * (which remains as the `columnar=false` escape hatch and the
  * simplest-possible reference implementation).
  */
class XvecColumnarReader(p: XvecInputPartition, fmt: XvecFormat, columns: Seq[String])
    extends PartitionReader[ColumnarBatch] {

  private val stride = fmt.stride(p.dimExpected)
  private val batchRecords = math.max(1, (4 << 20) / stride)

  private val schema = StructType(columns.map {
    case "ordinal" => StructField("ordinal", LongType, nullable = false)
    case "vector"  => StructField("vector",
      ArrayType(fmt.elementType, containsNull = false), nullable = false)
    case other     => throw new IllegalArgumentException(s"unknown column: $other")
  })

  private val ch = FileChannel.open(Paths.get(p.path), StandardOpenOption.READ)
  private var current = p.recordStart
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (current >= p.recordEnd) return false
    val n = math.min(batchRecords.toLong, p.recordEnd - current).toInt

    val bytes = ByteBuffer.allocate(n * stride).order(ByteOrder.LITTLE_ENDIAN)
    var read = 0
    while (read < bytes.capacity()) {
      val r = ch.read(bytes, p.dataOffset + current * stride + read)
      require(r > 0, s"${p.path}: unexpected EOF at record $current")
      read += r
    }
    bytes.flip()

    val vectors = OnHeapColumnVector.allocateColumns(n, schema)
    columns.zipWithIndex.foreach { case (c, ci) =>
      val cv = vectors(ci)
      if (c == "ordinal") {
        var i = 0
        while (i < n) { cv.putLong(i, current + i); i += 1 }
      } else {
        val child = cv.arrayData()
        child.reserve(n * p.dimExpected)
        var i = 0
        while (i < n) {
          bytes.position(i * stride)
          val dim =
            if (fmt.recordHeaderBytes == 4) {
              val d = bytes.getInt()
              require(d == p.dimExpected,
                s"${p.path}: record ${current + i} has dim $d, expected ${p.dimExpected}")
              d
            } else p.dimExpected
          fmt.decode(bytes, dim) match {
            case a: Array[Float]  => child.putFloats(i * dim, dim, a, 0)
            case a: Array[Int]    => child.putInts(i * dim, dim, a, 0)
            case a: Array[Short]  => child.putShorts(i * dim, dim, a, 0)
            case a: Array[Double] => child.putDoubles(i * dim, dim, a, 0)
            case other => throw new IllegalStateException(s"unexpected decode: $other")
          }
          cv.putArray(i, i * dim, dim)
          i += 1
        }
      }
    }
    batch = new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
    current += n
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    if (batch != null) batch.close()
    ch.close()
  }
}
