package graft.predicates

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

/** Binary wire codec for PNode trees, byte-compatible with the reference's
  * three dialects (PNode.java:50-96, PredicateNode.java:194-269,
  * PredicateContext.java:60-143):
  *
  *  - indexed:     `[type][field:1][op:1][n:2][i64*n]`
  *  - named:       `[type][nameLen:2][name][op:1][n:2][i64*n]`
  *  - named-typed: `[type][nameLen:2][name][op:1][n:2][(tag,value)*n]`
  *  - framed:      `[0x02][tree]` or `[0x02][0xFF][named-typed tree]`
  *
  * All little-endian. Conjugates: `[type][count:1][children...]`.
  */
object PNodeCodec {
  val Dialect: Byte = 0x02
  val TypedVersionMarker: Byte = 0xff.toByte

  private val TPred = 0; private val TAnd = 1; private val TOr = 2

  sealed trait Mode
  object Mode {
    case object Indexed extends Mode
    case object Named extends Mode
    case object NamedTyped extends Mode
  }

  // ---- encode ----

  def encode(node: PNode, mode: Mode): Array[Byte] = {
    val buf = ByteBuffer.allocate(measure(node, mode)).order(ByteOrder.LITTLE_ENDIAN)
    write(node, mode, buf)
    buf.array()
  }

  /** Framed: dialect leader, plus 0xFF marker for the typed dialect.
    * The framed wire format only distinguishes indexed vs named-typed
    * (PNode.java:84-96) — framing the legacy Named dialect would be
    * misparsed as Indexed on decode, so it is rejected here.
    */
  def encodeFramed(node: PNode, mode: Mode): Array[Byte] = {
    require(mode != Mode.Named,
      "framed format cannot carry the legacy Named dialect (no marker byte); use NamedTyped")
    val body = encode(node, mode)
    val head: Array[Byte] =
      if (mode == Mode.NamedTyped) Array(Dialect, TypedVersionMarker) else Array(Dialect)
    head ++ body
  }

  private def measure(node: PNode, mode: Mode): Int = node match {
    case ConjugateNode(_, cs) => 2 + cs.map(measure(_, mode)).sum
    case p: PredicateNode =>
      val fieldPart = mode match {
        case Mode.Indexed => 1
        case _            => 2 + p.effectiveName.getBytes(StandardCharsets.UTF_8).length
      }
      val valuesPart = mode match {
        case Mode.NamedTyped => p.comparands.map(comparandSize).sum
        case _               => 8 * p.comparands.size
      }
      1 + fieldPart + 1 + 2 + valuesPart
  }

  private def comparandSize(c: Comparand): Int = c match {
    case Comparand.IntVal(_)   => 9
    case Comparand.FloatVal(_) => 9
    case Comparand.TextVal(s)  => 3 + s.getBytes(StandardCharsets.UTF_8).length
    case Comparand.BoolVal(_)  => 2
    case Comparand.BytesVal(b) => 5 + b.size
    case Comparand.NullVal     => 1
  }

  private def write(node: PNode, mode: Mode, buf: ByteBuffer): Unit = node match {
    case ConjugateNode(isAnd, cs) =>
      buf.put((if (isAnd) TAnd else TOr).toByte)
      buf.put(cs.size.toByte)
      cs.foreach(write(_, mode, buf))
    case p: PredicateNode =>
      buf.put(TPred.toByte)
      mode match {
        case Mode.Indexed =>
          require(p.field >= 0, s"indexed encode of named-only predicate: $p")
          buf.put(p.field.toByte)
        case _ =>
          val nb = p.effectiveName.getBytes(StandardCharsets.UTF_8)
          buf.putShort(nb.length.toShort)
          buf.put(nb)
      }
      buf.put(p.op.ordinal.toByte)
      buf.putShort(p.comparands.size.toShort)
      mode match {
        case Mode.NamedTyped => p.comparands.foreach(writeComparand(_, buf))
        case _ =>
          p.comparands.foreach {
            case Comparand.IntVal(v) => buf.putLong(v)
            case other => throw new IllegalArgumentException(
              s"legacy i64 dialect cannot carry $other — use NamedTyped")
          }
      }
  }

  private def writeComparand(c: Comparand, buf: ByteBuffer): Unit = c match {
    case Comparand.IntVal(v)   => buf.put(0: Byte).putLong(v)
    case Comparand.FloatVal(v) => buf.put(1: Byte).putDouble(v)
    case Comparand.TextVal(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      buf.put(2: Byte).putShort(b.length.toShort).put(b)
    case Comparand.BoolVal(v)  => buf.put(3: Byte).put((if (v) 1 else 0).toByte)
    case Comparand.BytesVal(b) => buf.put(4: Byte).putInt(b.size).put(b.toArray)
    case Comparand.NullVal     => buf.put(5: Byte)
  }

  // ---- decode ----

  def decode(bytes: Array[Byte], mode: Mode): PNode =
    read(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN), mode)

  /** Framed auto-detection per PNode.fromFramedBuffer (PNode.java:84-96):
    * leader 0x02, then 0xFF selects the named-typed dialect, else indexed.
    */
  def decodeFramed(bytes: Array[Byte]): PNode = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val leader = buf.get()
    require(leader == Dialect,
      f"expected PNode dialect leader 0x02, got 0x${leader & 0xff}%02x")
    if (buf.remaining() > 0 && buf.get(buf.position()) == TypedVersionMarker) {
      buf.get()
      read(buf, Mode.NamedTyped)
    } else read(buf, Mode.Indexed)
  }

  private def read(buf: ByteBuffer, mode: Mode): PNode = {
    val t = buf.get().toInt
    t match {
      case TAnd | TOr =>
        val n = buf.get() & 0xff
        ConjugateNode(isAnd = t == TAnd, (0 until n).map(_ => read(buf, mode)))
      case TPred =>
        val (field, name) = mode match {
          case Mode.Indexed => (buf.get() & 0xff, None)
          case _ =>
            val len = buf.getShort() & 0xffff
            val nb = new Array[Byte](len)
            buf.get(nb)
            (-1, Some(new String(nb, StandardCharsets.UTF_8)))
        }
        val op = OpType.fromOrdinal(buf.get().toInt)
        val n = buf.getShort() & 0xffff
        val cs: Seq[Comparand] = mode match {
          case Mode.NamedTyped => (0 until n).map(_ => readComparand(buf))
          case _               => (0 until n).map(_ => Comparand.IntVal(buf.getLong()))
        }
        PredicateNode(field, name, op, cs, typed = mode == Mode.NamedTyped)
      case other =>
        throw new IllegalArgumentException(s"unknown node type tag: $other")
    }
  }

  private def readComparand(buf: ByteBuffer): Comparand = (buf.get(): @unchecked) match {
    case 0 => Comparand.IntVal(buf.getLong())
    case 1 => Comparand.FloatVal(buf.getDouble())
    case 2 =>
      val len = buf.getShort() & 0xffff
      val b = new Array[Byte](len); buf.get(b)
      Comparand.TextVal(new String(b, StandardCharsets.UTF_8))
    case 3 => Comparand.BoolVal(buf.get() != 0)
    case 4 =>
      val len = buf.getInt()
      val b = new Array[Byte](len); buf.get(b)
      Comparand.BytesVal(b.toVector)
    case 5 => Comparand.NullVal
    case other => throw new IllegalArgumentException(s"unknown comparand tag: $other")
  }
}
