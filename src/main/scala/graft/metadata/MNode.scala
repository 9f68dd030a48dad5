package graft.metadata

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

/** Self-describing binary metadata records (SURVEY.md §1.1/§1.2; reference
  * spec/metadata/MNode.java:27-150): a record is an ordered list of
  * (name, tagged value) fields, wire format
  *
  * ```
  * [dialect:1 = 0x01][field_count:2]
  * per field: [nameLen:2][nameUtf8][typeTag:1][valueBytes...]
  * ```
  *
  * little-endian throughout; stream framing prepends `[totalLen:4]`.
  * All 29 value tags are supported.
  */
sealed trait MValue { def tag: Int }
object MValue {
  final case class Str(v: String) extends MValue { val tag = 0 }
  final case class I64(v: Long) extends MValue { val tag = 1 }
  final case class F64(v: Double) extends MValue { val tag = 2 }
  final case class Bool(v: Boolean) extends MValue { val tag = 3 }
  final case class Bytes(v: Vector[Byte]) extends MValue { val tag = 4 }
  case object Null extends MValue { val tag = 5 }
  final case class EnumStr(v: String) extends MValue { val tag = 6 }
  final case class EnumOrd(v: Int) extends MValue { val tag = 7 }
  final case class MList(v: Seq[MValue]) extends MValue { val tag = 8 }
  final case class Node(v: MNode) extends MValue { val tag = 9 }
  final case class Text(v: String) extends MValue { val tag = 10 }
  final case class Ascii(v: String) extends MValue { val tag = 11 }
  final case class I32(v: Int) extends MValue { val tag = 12 }
  final case class I16(v: Short) extends MValue { val tag = 13 }
  final case class Dec(v: BigDecimal) extends MValue { val tag = 14 }
  final case class VarInt(v: BigInt) extends MValue { val tag = 15 }
  final case class F32(v: Float) extends MValue { val tag = 16 }
  final case class F16(v: Float) extends MValue { val tag = 17 } // stored as binary16
  final case class Millis(epochMs: Long) extends MValue { val tag = 18 }
  final case class Nanos(epochSec: Long, nanoAdjust: Int) extends MValue { val tag = 19 }
  final case class Date(iso: String) extends MValue { val tag = 20 }
  final case class Time(iso: String) extends MValue { val tag = 21 }
  final case class DateTime(iso: String) extends MValue { val tag = 22 }
  final case class UuidV1(msb: Long, lsb: Long) extends MValue { val tag = 23 }
  final case class UuidV7(msb: Long, lsb: Long) extends MValue { val tag = 24 }
  final case class UlidVal(bytes: Vector[Byte]) extends MValue { val tag = 25 }
  final case class TypedArray(elemTag: Int, v: Seq[MValue]) extends MValue { val tag = 26 }
  final case class MSet(v: Seq[MValue]) extends MValue { val tag = 27 }
  final case class TypedMap(v: Seq[(MValue, MValue)]) extends MValue { val tag = 28 }
}

final case class MNode(fields: Seq[(String, MValue)]) {
  def get(name: String): Option[MValue] = fields.collectFirst { case (`name`, v) => v }
  def toMap: Map[String, MValue] = fields.toMap
}

object MNodeCodec {
  import MValue._

  val Dialect: Byte = 0x01

  // ---- encode ----

  def encode(node: MNode): Array[Byte] = {
    val buf = ByteBuffer.allocate(measureNode(node)).order(ByteOrder.LITTLE_ENDIAN)
    writeNode(node, buf)
    buf.array()
  }

  /** Stream framing: [totalLen:4][dialect][payload]. */
  def encodeFramed(node: MNode): Array[Byte] = {
    val body = encode(node)
    val buf = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(body.length).put(body)
    buf.array()
  }

  private def measureNode(node: MNode): Int =
    3 + node.fields.map { case (name, v) =>
      2 + name.getBytes(StandardCharsets.UTF_8).length + 1 + measure(v)
    }.sum

  private def measure(v: MValue): Int = v match {
    case Str(s)        => 4 + utf8len(s)
    case I64(_)        => 8
    case F64(_)        => 8
    case Bool(_)       => 1
    case Bytes(b)      => 4 + b.size
    case Null          => 0
    case EnumStr(s)    => 4 + utf8len(s)
    case EnumOrd(_)    => 4
    case MList(xs)     => 4 + xs.map(x => 1 + measure(x)).sum
    case Node(n)       => 4 + measureNode(n)
    case Text(s)       => 4 + utf8len(s)
    case Ascii(s)      => 4 + s.length
    case I32(_)        => 4
    case I16(_)        => 2
    case Dec(d)        => 8 + d.underlying.unscaledValue.toByteArray.length
    case VarInt(b)     => 4 + b.toByteArray.length
    case F32(_)        => 4
    case F16(_)        => 2
    case Millis(_)     => 8
    case Nanos(_, _)   => 12
    case Date(s)       => 4 + utf8len(s)
    case Time(s)       => 4 + utf8len(s)
    case DateTime(s)   => 4 + utf8len(s)
    case UuidV1(_, _)  => 16
    case UuidV7(_, _)  => 16
    case UlidVal(_)    => 16
    case TypedArray(_, xs) => 5 + xs.map(measure).sum
    case MSet(xs)      => 4 + xs.map(x => 1 + measure(x)).sum
    case TypedMap(kvs) => 4 + kvs.map { case (k, vv) => 2 + measure(k) + measure(vv) }.sum
  }

  private def utf8len(s: String) = s.getBytes(StandardCharsets.UTF_8).length

  private def writeNode(node: MNode, buf: ByteBuffer): Unit = {
    buf.put(Dialect)
    buf.putShort(node.fields.size.toShort)
    node.fields.foreach { case (name, v) =>
      val nb = name.getBytes(StandardCharsets.UTF_8)
      buf.putShort(nb.length.toShort).put(nb)
      buf.put(v.tag.toByte)
      writeValue(v, buf)
    }
  }

  private def writeValue(v: MValue, buf: ByteBuffer): Unit = v match {
    case Str(s)       => putLenUtf8(buf, s)
    case I64(x)       => buf.putLong(x)
    case F64(x)       => buf.putDouble(x)
    case Bool(b)      => buf.put((if (b) 1 else 0).toByte)
    case Bytes(b)     => buf.putInt(b.size).put(b.toArray)
    case Null         => ()
    case EnumStr(s)   => putLenUtf8(buf, s)
    case EnumOrd(o)   => buf.putInt(o)
    case MList(xs)    => buf.putInt(xs.size); xs.foreach { x => buf.put(x.tag.toByte); writeValue(x, buf) }
    case Node(n) =>
      val body = encode(n)
      buf.putInt(body.length).put(body)
    case Text(s)      => putLenUtf8(buf, s)
    case Ascii(s)     => buf.putInt(s.length).put(s.getBytes(StandardCharsets.US_ASCII))
    case I32(x)       => buf.putInt(x)
    case I16(x)       => buf.putShort(x)
    case Dec(d) =>
      val unscaled = d.underlying.unscaledValue.toByteArray
      buf.putInt(d.scale).putInt(unscaled.length).put(unscaled)
    case VarInt(b) =>
      val arr = b.toByteArray
      buf.putInt(arr.length).put(arr)
    case F32(x)       => buf.putFloat(x)
    case F16(x)       => buf.putShort(graft.functions.Half.fromFloat(x))
    case Millis(ms)   => buf.putLong(ms)
    case Nanos(s, n)  => buf.putLong(s).putInt(n)
    case Date(s)      => putLenUtf8(buf, s)
    case Time(s)      => putLenUtf8(buf, s)
    case DateTime(s)  => putLenUtf8(buf, s)
    case UuidV1(m, l) => buf.putLong(m).putLong(l)
    case UuidV7(m, l) => buf.putLong(m).putLong(l)
    case UlidVal(b)   => require(b.size == 16); buf.put(b.toArray)
    case TypedArray(elemTag, xs) =>
      buf.put(elemTag.toByte).putInt(xs.size)
      xs.foreach(writeValue(_, buf))
    case MSet(xs)     => buf.putInt(xs.size); xs.foreach { x => buf.put(x.tag.toByte); writeValue(x, buf) }
    case TypedMap(kvs) =>
      buf.putInt(kvs.size)
      kvs.foreach { case (k, vv) =>
        buf.put(k.tag.toByte); writeValue(k, buf)
        buf.put(vv.tag.toByte); writeValue(vv, buf)
      }
  }

  private def putLenUtf8(buf: ByteBuffer, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    buf.putInt(b.length).put(b)
  }

  // ---- decode ----

  def decode(bytes: Array[Byte]): MNode =
    readNode(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))

  def decodeFramed(bytes: Array[Byte]): MNode = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val len = buf.getInt()
    require(len == buf.remaining(), s"framed length $len != remaining ${buf.remaining()}")
    readNode(buf)
  }

  private def readNode(buf: ByteBuffer): MNode = {
    val dialect = buf.get()
    require(dialect == Dialect, f"expected MNode dialect 0x01, got 0x$dialect%02x")
    val n = buf.getShort() & 0xffff
    MNode((0 until n).map { _ =>
      val nameLen = buf.getShort() & 0xffff
      val nb = new Array[Byte](nameLen); buf.get(nb)
      val tag = buf.get() & 0xff
      new String(nb, StandardCharsets.UTF_8) -> readValue(tag, buf)
    })
  }

  private def readValue(tag: Int, buf: ByteBuffer): MValue = tag match {
    case 0  => Str(getLenUtf8(buf))
    case 1  => I64(buf.getLong())
    case 2  => F64(buf.getDouble())
    case 3  => Bool(buf.get() != 0)
    case 4  => val b = new Array[Byte](buf.getInt()); buf.get(b); Bytes(b.toVector)
    case 5  => Null
    case 6  => EnumStr(getLenUtf8(buf))
    case 7  => EnumOrd(buf.getInt())
    case 8  => MList((0 until buf.getInt()).map(_ => readValue(buf.get() & 0xff, buf)))
    case 9  =>
      val len = buf.getInt()
      val b = new Array[Byte](len); buf.get(b)
      Node(decode(b))
    case 10 => Text(getLenUtf8(buf))
    case 11 => val b = new Array[Byte](buf.getInt()); buf.get(b); Ascii(new String(b, StandardCharsets.US_ASCII))
    case 12 => I32(buf.getInt())
    case 13 => I16(buf.getShort())
    case 14 =>
      val scale = buf.getInt()
      val b = new Array[Byte](buf.getInt()); buf.get(b)
      Dec(BigDecimal(BigInt(b), scale))
    case 15 => val b = new Array[Byte](buf.getInt()); buf.get(b); VarInt(BigInt(b))
    case 16 => F32(buf.getFloat())
    case 17 => F16(graft.functions.Half.toFloat(buf.getShort()))
    case 18 => Millis(buf.getLong())
    case 19 => Nanos(buf.getLong(), buf.getInt())
    case 20 => Date(getLenUtf8(buf))
    case 21 => Time(getLenUtf8(buf))
    case 22 => DateTime(getLenUtf8(buf))
    case 23 => UuidV1(buf.getLong(), buf.getLong())
    case 24 => UuidV7(buf.getLong(), buf.getLong())
    case 25 => val b = new Array[Byte](16); buf.get(b); UlidVal(b.toVector)
    case 26 =>
      val elemTag = buf.get() & 0xff
      TypedArray(elemTag, (0 until buf.getInt()).map(_ => readValue(elemTag, buf)))
    case 27 => MSet((0 until buf.getInt()).map(_ => readValue(buf.get() & 0xff, buf)))
    case 28 =>
      TypedMap((0 until buf.getInt()).map { _ =>
        val k = readValue(buf.get() & 0xff, buf)
        val v = readValue(buf.get() & 0xff, buf)
        k -> v
      })
    case other => throw new IllegalArgumentException(s"unknown MNode tag: $other")
  }

  private def getLenUtf8(buf: ByteBuffer): String = {
    val b = new Array[Byte](buf.getInt()); buf.get(b)
    new String(b, StandardCharsets.UTF_8)
  }
}
