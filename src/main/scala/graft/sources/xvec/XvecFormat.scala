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

  /** Per-record header bytes: the xvec family's int32 dim prefix. File-
    * headered formats (npy) have none. */
  def recordHeaderBytes: Int = 4

  def stride(dim: Int): Int = recordHeaderBytes + dim * componentSize

  /** (dim, data byte offset, record count) from the file's own metadata.
    * xvec: dim from the first record header, offset 0, count from size;
    * npy: all three from the file header. Fail-fast on malformed files
    * (the reference's open-time validation, dataset_yaml_v1.md:106-113).
    */
  def fileMeta(path: Path): (Int, Long, Long) = {
    val ch = FileChannel.open(path, StandardOpenOption.READ)
    try {
      val size = ch.size()
      require(size >= 4, s"$path: too small for an xvec header ($size bytes)")
      val head = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      ch.read(head, 0)
      head.flip()
      val dim = head.getInt()
      require(dim > 0, s"$path: invalid dimension header $dim")
      val s = stride(dim)
      require(size % s == 0,
        s"$path: size $size not a multiple of stride $s (dim=$dim) — truncated or mixed-dim file")
      (dim, 0L, size / s)
    } finally ch.close()
  }

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

  /** NumPy `.npy` (version 1.0/2.0, C-order little-endian float32 2-D
    * arrays — the de-facto interchange format for embedding dumps) as a
    * member of the scan family: one file header carries dtype/shape, then
    * headerless packed rows, so window pushdown / column pruning /
    * streaming all apply unchanged. Writes emit a version-1.0 header
    * padded to a fixed 128 bytes (shape patched after the stream).
    */
  case object Npy extends XvecFormat("npy", 4, FloatType) {
    override def recordHeaderBytes: Int = 0

    def decode(buf: ByteBuffer, dim: Int): AnyRef = {
      val out = new Array[Float](dim)
      buf.asFloatBuffer().get(out)
      buf.position(buf.position() + dim * 4)
      out
    }

    def encode(buf: ByteBuffer, vec: Seq[Any]): Unit =
      vec.foreach(v => buf.putFloat(v.asInstanceOf[Float]))

    private val headerRe =
      ("""\{\s*'descr'\s*:\s*'([^']+)'\s*,\s*'fortran_order'\s*:\s*(True|False)""" +
        """\s*,\s*'shape'\s*:\s*\(\s*(\d+)\s*,\s*(\d+)\s*,?\s*\)\s*,?\s*\}\s*""").r

    /** Positioned reads may return short (network/FUSE filesystems) — loop
      * to the full requested length, as the data-path readers do. */
    private def readFully(ch: FileChannel, buf: ByteBuffer, at: Long): Unit = {
      var pos = at
      while (buf.hasRemaining) {
        val r = ch.read(buf, pos)
        require(r > 0, s"unexpected EOF at byte $pos")
        pos += r
      }
      buf.flip()
    }

    override def fileMeta(path: Path): (Int, Long, Long) = {
      val ch = FileChannel.open(path, StandardOpenOption.READ)
      try {
        val size = ch.size()
        require(size >= 12, s"$path: too small for an npy header ($size bytes)")
        val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        readFully(ch, head, 0)
        val magic = new Array[Byte](6)
        head.get(magic)
        require(magic.sameElements("\u0093NUMPY".getBytes("ISO-8859-1")),
          s"$path: not an npy file (bad magic)")
        val major = head.get()
        head.get() // minor
        val (dictAt, dictLen) =
          if (major == 1) (10L, (head.getShort(8) & 0xffff).toLong)
          else if (major == 2) (12L, head.getInt(8).toLong & 0xffffffffL)
          else throw new IllegalArgumentException(s"$path: unsupported npy version $major")
        require(dictAt + dictLen <= size, s"$path: npy header overruns the file")
        val dictBuf = ByteBuffer.allocate(dictLen.toInt)
        readFully(ch, dictBuf, dictAt)
        val dict = new String(dictBuf.array(), "ISO-8859-1").trim
        dict match {
          case headerRe(descr, fortran, n, d) =>
            require(descr == "<f4",
              s"$path: npy dtype $descr unsupported (only C little-endian float32 '<f4')")
            require(fortran == "False", s"$path: fortran-order npy unsupported")
            val dim = d.toInt
            val count = n.toLong
            require(dim > 0 || count == 0, s"$path: invalid npy dim $dim")
            val offset = dictAt + dictLen
            require(offset + count * stride(dim) == size,
              s"$path: npy size $size inconsistent with shape ($count, $dim) at offset $offset")
            // empty arrays report a dummy positive dim so downstream
            // stride math stays divide-safe; count 0 plans no partitions
            (if (count == 0) math.max(dim, 1) else dim, offset, count)
          case _ => throw new IllegalArgumentException(
            s"$path: cannot parse npy header dict (2-D C-order arrays only): $dict")
        }
      } finally ch.close()
    }
  }

  val all: Seq[XvecFormat] = Seq(Fvec, Ivec, Bvec, Dvec, Svec, Mvec, Npy)

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
    * Delegates to the format's own [[XvecFormat.fileMeta]] validation.
    */
  def stat(path: Path, fmt: XvecFormat): (Int, Int, Long) = {
    val (dim, _, count) = fmt.fileMeta(path)
    (dim, fmt.stride(dim), count)
  }

  /** Driver-side point read — the DatasetView.get(i) analogue (set-oriented
    * access goes through the DSv2 scan instead).
    */
  def readRecord(path: Path, fmt: XvecFormat, ordinal: Long): AnyRef = {
    val (dim, offset, count) = fmt.fileMeta(path)
    val stride = fmt.stride(dim)
    require(ordinal >= 0 && ordinal < count, s"ordinal $ordinal out of [0, $count)")
    val ch = FileChannel.open(path, StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(stride).order(ByteOrder.LITTLE_ENDIAN)
      ch.read(buf, offset + ordinal * stride)
      buf.flip()
      if (fmt.recordHeaderBytes == 4) {
        val d = buf.getInt()
        require(d == dim, s"$path: record $ordinal has dim $d, expected $dim")
      }
      fmt.decode(buf, dim)
    } finally ch.close()
  }

  /** Local writer: stream (ordinal-sorted) vectors to an xvec/npy file. */
  def writeLocal(path: String, fmt: XvecFormat, vectors: Iterator[Seq[Any]]): Long =
    if (fmt == Npy) writeNpyLocal(path, vectors)
    else {
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

  /** Fixed 128-byte npy header: 10-byte v1.0 prefix + dict padded with
    * spaces to a '\n' at byte 127 (numpy's own alignment convention). The
    * dict is (re)written AFTER streaming so the shape is exact without
    * buffering the data.
    */
  private def writeNpyLocal(path: String, vectors: Iterator[Seq[Any]]): Long = {
    val HeaderTotal = 128
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.position(HeaderTotal.toLong)
      var n = 0L
      var dim = -1
      val chunk = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
      def flush(): Unit = { chunk.flip(); while (chunk.hasRemaining) ch.write(chunk); chunk.clear() }
      vectors.foreach { vec =>
        if (dim == -1) dim = vec.size
        require(vec.size == dim, s"non-uniform dim: ${vec.size} vs $dim")
        if (chunk.remaining() < dim * 4) flush()
        Npy.encode(chunk, vec)
        n += 1
      }
      flush()
      val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, ${math.max(dim, 0)}), }"
      require(dict.length <= HeaderTotal - 11, s"npy header dict too long: $dict")
      val head = ByteBuffer.allocate(HeaderTotal).order(ByteOrder.LITTLE_ENDIAN)
      head.put("\u0093NUMPY".getBytes("ISO-8859-1")).put(1.toByte).put(0.toByte)
      head.putShort((HeaderTotal - 10).toShort)
      head.put(dict.getBytes("ISO-8859-1"))
      while (head.position() < HeaderTotal - 1) head.put(' '.toByte)
      head.put('\n'.toByte)
      head.flip()
      ch.position(0L)
      while (head.hasRemaining) ch.write(head)
      n
    } finally ch.close()
  }

  def path(s: String): Path = Paths.get(s)
}
