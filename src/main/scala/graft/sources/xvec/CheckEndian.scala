package graft.sources.xvec

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `analyze check-endian` (reference README.md:45): the endianness sanity
  * check over xvec files. The format is specified little-endian, but a
  * file produced by a byte-order-naive writer reads back a garbage
  * dimension — and because `dim` is the record stride, EVERYTHING
  * downstream is silently wrong. The check decodes the leading int32
  * header under BOTH byte orders and scores each for plausibility:
  *
  *  - dim must be positive and sane (≤ `maxDim`);
  *  - the file size must be an exact multiple of the implied record
  *    stride (`4 + dim · componentSize`, from the file's extension);
  *  - record-header consistency: the dim header of the SECOND record
  *    (at offset `stride`) must equal the first — the property a
  *    wrong-endian read essentially never satisfies by accident.
  *
  * Verdict per file: `little-endian` / `big-endian` (exactly one order
  * plausible), `ambiguous` (both — e.g. a palindromic single-byte dim
  * like 0x01000001 cannot be told apart; rare and flagged rather than
  * guessed), `invalid` (neither — not an xvec file or truncated).
  * Driver-side: it reads ≤ 8 bytes per file at two offsets; the frame is
  * |files| rows of strings and never needs a cluster.
  */
object CheckEndian {

  final case class Result(file: String, dim_le: Int, dim_be: Int,
      le_plausible: Boolean, be_plausible: Boolean, verdict: String)

  private def readInt(ch: FileChannel, at: Long, order: ByteOrder): Option[Int] = {
    if (at + 4 > ch.size()) None
    else {
      val buf = ByteBuffer.allocate(4).order(order)
      var read = 0
      while (read < 4) {
        val r = ch.read(buf, at + read)
        require(r > 0, s"unexpected EOF at ${at + read}")
        read += r
      }
      buf.flip()
      Some(buf.getInt())
    }
  }

  /** Score one byte order for one file. */
  private def plausible(ch: FileChannel, fmt: XvecFormat, order: ByteOrder,
      maxDim: Int): (Int, Boolean) = {
    val size = ch.size()
    readInt(ch, 0L, order) match {
      case None => (0, false)
      case Some(dim) =>
        val ok = dim > 0 && dim <= maxDim && {
          val stride = fmt.stride(dim)
          size % stride == 0 && {
            // second-record header must repeat the dim (single-record
            // files pass vacuously — size checks already pinned them)
            if (size >= stride + 4)
              readInt(ch, stride.toLong, order).contains(dim)
            else true
          }
        }
        (dim, ok)
    }
  }

  /** Check one file; the format (component width) comes from its
    * extension, as everywhere in the xvec family.
    */
  def checkFile(path: String, maxDim: Int = 1 << 20): Result = {
    require(Files.exists(Paths.get(path)), s"no such file: $path")
    val fmt = XvecFormat.forPath(path)
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val (dimLe, leOk) = plausible(ch, fmt, ByteOrder.LITTLE_ENDIAN, maxDim)
      val (dimBe, beOk) = plausible(ch, fmt, ByteOrder.BIG_ENDIAN, maxDim)
      val verdict = (leOk, beOk) match {
        case (true, false) => "little-endian"
        case (false, true) => "big-endian"
        case (true, true)  => "ambiguous"
        case _             => "invalid"
      }
      Result(path, dimLe, dimBe, leOk, beOk, verdict)
    } finally ch.close()
  }

  /** Check many files into one report frame. */
  def check(spark: SparkSession, paths: Seq[String],
      maxDim: Int = 1 << 20): DataFrame = {
    require(paths.nonEmpty, "check-endian: need at least one file")
    import spark.implicits._
    paths.map(checkFile(_, maxDim)).toDF()
  }
}
