package graft.metadata

import java.nio.{ByteBuffer, ByteOrder}

import graft.predicates.{PNode, PNodeCodec}

/** Mixed metadata/predicate record streams (reference spec/codec/ANode —
  * ANodeTest exercises MNode (dialect 0x01) and PNode (dialect 0x02) records
  * interleaved in one length-framed stream).
  *
  * Frame: `[totalLen:4 LE][dialect:1][payload]` per record.
  */
object ANode {

  sealed trait Record
  final case class M(node: MNode) extends Record
  final case class P(tree: PNode) extends Record

  def encode(records: Seq[Record]): Array[Byte] = {
    val bodies = records.map {
      case M(n) => MNodeCodec.encode(n)
      case P(t) => PNodeCodec.encodeFramed(t, PNodeCodec.Mode.NamedTyped)
    }
    val buf = ByteBuffer.allocate(bodies.map(4 + _.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    bodies.foreach(b => buf.putInt(b.length).put(b))
    buf.array()
  }

  def decode(bytes: Array[Byte]): Seq[Record] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    while (buf.remaining() >= 4) {
      val len = buf.getInt()
      require(len >= 1 && len <= buf.remaining(),
        s"bad ANode frame length $len (remaining ${buf.remaining()})")
      val body = new Array[Byte](len)
      buf.get(body)
      out += (body(0) match {
        case MNodeCodec.Dialect => M(MNodeCodec.decode(body))
        case PNodeCodec.Dialect => P(PNodeCodec.decodeFramed(body))
        case other => throw new IllegalArgumentException(
          f"unknown ANode dialect 0x$other%02x")
      })
    }
    require(buf.remaining() == 0, s"trailing ${buf.remaining()} bytes in ANode stream")
    out.toSeq
  }
}
