package graft.sources.xvec

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.channels.FileChannel
import java.nio.file.{Path, Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.types._

import graft.functions.Half

/** The xvec dense-vector binary format family (SURVEY.md §2.1 S1-S6;
  * reference docs/specs/dataset_yaml_v1.md:100-141 and
  * datatools-io-xvec readers): little-endian records of
  * `[dim:int32][components...]`, one uniform dimension per file, O(1)
  * addressing at `ordinal * stride` with `stride = 4 + dim * componentSize`.
  */
sealed abstract class XvecFormat(
    val ext: String,
    val componentSize: Int,
    val elementType: DataType) {

  def stride(dim: Int): Int = 4 + dim * componentSize

  /** Decode `dim` components from `buf` (positioned after the header). */
  def decode(buf: ByteBuffer, dim: Int): AnyRef

  /** Encode one vector (boxed Seq from a Row) into `buf` incl. header. */
  def encode(buf: ByteBuffer, vec: Seq[Any]): Unit
}

object XvecFormat {

  case object Fvec extends XvecFormat("fvec", 4, FloatType) {
    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Float](dim)
      buf.asFloatBuffer().get(out)
      buf.position(buf.position() + dim * 4)
      out
    }
    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit = {
      buf.putInt(vec.size)
      vec.foreach(v => buf.putFloat(v.asInstanceOf[Float]))
    }
  }

  case object Ivec extends XvecFormat("ivec", 4, IntegerType) {
    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Int](dim)
      buf.asIntBuffer().get(out)
      buf.position(buf.position() + dim * 4)
      out
    }
    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit = {
      buf.putInt(vec.size)
      vec.foreach(v => buf.putInt(v.asInstanceOf[Int]))
    }
  }

  /** uint8 payload widened to short (Spark has no unsigned types —
    * SURVEY.md §7 hard part 7).
    */
  case object Bvec extends XvecFormat("bvec", 1, ShortType) {
    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Short](dim)
      var i = 0
      while (i < dim) { out(i) = (buf.get() & 0xff).toShort; i += 1 }
      out
    }
    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit = {
      buf.putInt(vec.size)
      vec.foreach { v =>
        val s = v.asInstanceOf[Short]
        require(s >= 0 && s <= 255, s"bvec component out of uint8 range: $s")
        buf.put((s & 0xff).toByte)
      }
    }
  }

  case object Dvec extends XvecFormat("dvec", 8, DoubleType) {
    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Double](dim)
      buf.asDoubleBuffer().get(out)
      buf.position(buf.position() + dim * 8)
      out
    }
    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit = {
      buf.putInt(vec.size)
      vec.foreach(v => buf.putDouble(v.asInstanceOf[Double]))
    }
  }

  case object Svec extends XvecFormat("svec", 2, ShortType) {
    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Short](dim)
      buf.asShortBuffer().get(out)
      buf.position(buf.position() + dim * 2)
      out
    }
    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit = {
      buf.putInt(vec.size)
      vec.foreach(v => buf.putShort(v.asInstanceOf[Short]))
    }
  }

  /** float16 on disk, decoded to float32 at scan time (reference
    * CoreXVecVectorDatasetViewMethods.java:168-194).
    */
  case object Mvec extends XvecFormat("mvec", 2, FloatType) {
    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) { out(i) = Half.toFloat(buf.getShort()); i += 1 }
      out
    }
    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit = {
      buf.putInt(vec.size)
      vec.foreach(v => buf.putShort(Half.fromFloat(v.asInstanceOf[Float])))
    }
  }

  val all: Seq[XvecFormat] = Seq(Fvec, Ivec, Bvec, Dvec, Svec, Mvec)

  def forPath(path: String): XvecFormat = {
    val lower = path.toLowerCase
    all.find(f => lower.endsWith("." + f.ext) || lower.endsWith("." + f.ext + "s"))
      .getOrElse(throw new IllegalArgumentException(s"not an xvec path: $path"))
  }

  def forName(name: String): XvecFormat = {
    val n = name.toLowerCase.stripSuffix("s")
    all.find(_.ext == n)
      .getOrElse(throw new IllegalArgumentException(s"unknown xvec format: $name"))
  }

  /** File metadata from the header + size: (dim, stride, recordCount).
    * Fail-fast on malformed files (zero-size, bad dim, misaligned length —
    * the reference's open-time validation, dataset_yaml_v1.md:106-113).
    */
  def stat(path: Path, fmt: XvecFormat): (Int, Int, Long) = {
    val ch = FileChannel.open(path, StandardOpenOption.READ)
    try {
      val size = ch.size()
      require(size >= 4, s"$path: too small for an xvec header ($size bytes)")
      val head = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      ch.read(head, 0)
      head.flip()
      val dim = head.getInt()
      require(dim > 0, s"$path: invalid dimension header $dim")
      val stride = fmt.stride(dim)
      require(size % stride == 0,
        s"$path: size $size not a multiple of stride $stride (dim=$dim) — truncated or mixed-dim file")
      (dim, stride, size / stride)
    } finally ch.close()
  }

  /** Driver-side point read — the DatasetView.get(i) analogue (set-oriented
    * access goes through the DSv2 scan instead).
    */
  def readRecord(path: Path, fmt: XvecFormat, ordinal: Long): AnyRef = {
    val (dim, stride, count) = stat(path, fmt)
    require(ordinal >= 0 && ordinal < count, s"ordinal $ordinal out of [0, $count)")
    val ch = FileChannel.open(path, StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(stride).order(ByteOrder.LITTLE_ENDIAN)
      ch.read(buf, ordinal * stride)
      buf.flip()
      val d = buf.getInt()
      require(d == dim, s"$path: record $ordinal has dim $d, expected $dim")
      fmt.decode(buf, dim)
    } finally ch.close()
  }

  /** Local writer: stream (ordinal-sorted) vectors to an xvec file. */
  def writeLocal(path: String, fmt: XvecFormat, vectors: Iterator[Seq[Any]]): Long = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    var n = 0L
    var dim = -1
    try {
      vectors.foreach { vec =>
        if (dim == -1) dim = vec.size
        require(vec.size == dim, s"non-uniform dim: ${vec.size} vs $dim")
        val buf = ByteBuffer.allocate(fmt.stride(dim)).order(ByteOrder.LITTLE_ENDIAN)
        fmt.encode(buf, vec)
        out.write(buf.array(), 0, buf.position())
        n += 1
      }
      n
    } finally out.close()
  }

  def path(s: String): Path = Paths.get(s)
}
