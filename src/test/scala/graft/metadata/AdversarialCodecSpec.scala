package graft.metadata

import org.scalatest.funsuite.AnyFunSuite

import graft.predicates.{Comparand, OpType, PNodeCodec, PredicateNode}

/** Adversarial wire-format tests (mirrors the reference's
  * MNodeAdversarialTest / SlabAdversarialTest discipline, SURVEY.md §5.2):
  * malformed bytes must raise promptly — never hang, never fabricate
  * records.
  */
class AdversarialCodecSpec extends AnyFunSuite {

  private def truncations(bytes: Array[Byte]): Seq[Array[Byte]] =
    Seq(1, bytes.length / 3, bytes.length / 2, bytes.length - 1)
      .filter(n => n > 0 && n < bytes.length)
      .map(bytes.take)

  test("MNode: truncated buffers raise, never fabricate") {
    val node = MNode(Seq(
      "s" -> MValue.Str("hello"),
      "l" -> MValue.MList(Seq(MValue.I64(1), MValue.Bytes(Vector[Byte](1, 2, 3)))),
      "m" -> MValue.TypedMap(Seq((MValue.Str("k"), MValue.F64(1.5))))))
    truncations(MNodeCodec.encode(node)).foreach { bad =>
      intercept[RuntimeException](MNodeCodec.decode(bad))
    }
  }

  test("MNode: wrong dialect byte and unknown tags rejected") {
    val good = MNodeCodec.encode(MNode(Seq("a" -> MValue.I64(1))))
    val wrongDialect = good.clone(); wrongDialect(0) = 0x7f
    intercept[IllegalArgumentException](MNodeCodec.decode(wrongDialect))
    val badTag = good.clone()
    // field tag byte sits after [dialect][count:2][nameLen:2]["a"]
    badTag(6) = 99
    intercept[IllegalArgumentException](MNodeCodec.decode(badTag))
  }

  test("MNode: framed length mismatch rejected") {
    val framed = MNodeCodec.encodeFramed(MNode(Seq("a" -> MValue.Bool(true))))
    intercept[IllegalArgumentException](MNodeCodec.decodeFramed(framed.dropRight(1)))
  }

  test("PNode: truncated buffers raise") {
    val tree = graft.predicates.ConjugateNode.and(
      PredicateNode.namedTyped("f", OpType.IN,
        Comparand.TextVal("abc"), Comparand.IntVal(42)),
      PredicateNode.namedTyped("g", OpType.MATCHES, Comparand.TextVal("x.*")))
    val bytes = PNodeCodec.encodeFramed(tree, PNodeCodec.Mode.NamedTyped)
    truncations(bytes).foreach { bad =>
      intercept[RuntimeException](PNodeCodec.decodeFramed(bad))
    }
  }

  test("PNode: unknown op ordinal / node tag / comparand tag rejected") {
    // [PRED=0][field=1][op=9?][...] — op 9 out of range
    intercept[IllegalArgumentException](
      PNodeCodec.decode(Array[Byte](0, 1, 9, 0, 0), PNodeCodec.Mode.Indexed))
    intercept[IllegalArgumentException](
      PNodeCodec.decode(Array[Byte](7, 1, 0), PNodeCodec.Mode.Indexed))
  }

  test("xvec: boundary ordinals on point reads") {
    val p = java.nio.file.Paths.get("target", s"adv-${System.nanoTime()}.fvec")
    graft.sources.xvec.XvecFormat.writeLocal(p.toString,
      graft.sources.xvec.XvecFormat.Fvec, (0 until 3).map(i => Seq[Any](i.toFloat)).iterator)
    import graft.sources.xvec.XvecFormat
    assert(XvecFormat.readRecord(p, XvecFormat.Fvec, 2).asInstanceOf[Array[Float]].toSeq == Seq(2f))
    intercept[IllegalArgumentException](XvecFormat.readRecord(p, XvecFormat.Fvec, 3))
    intercept[IllegalArgumentException](XvecFormat.readRecord(p, XvecFormat.Fvec, -1))
  }

  test("ULID: wrong lengths and invalid chars rejected") {
    intercept[IllegalArgumentException](Ulid.fromCanonical("SHORT"))
    intercept[IllegalArgumentException](Ulid.fromCanonical("U" * 26)) // U not in alphabet
    intercept[IllegalArgumentException](Ulid.toCanonical(new Array[Byte](15)))
    // 0xFF... overflows 128 bits only if > 26 chars; max valid char works
    assert(Ulid.fromCanonical("7" + "Z" * 25).length == 16)
  }
}
