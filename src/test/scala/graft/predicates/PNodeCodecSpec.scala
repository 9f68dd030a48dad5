package graft.predicates

import org.scalatest.funsuite.AnyFunSuite

class PNodeCodecSpec extends AnyFunSuite {
  import Comparand._

  private val rnd = new scala.util.Random(11)

  private def randComparand(typed: Boolean): Comparand =
    if (!typed) IntVal(rnd.nextLong())
    else rnd.nextInt(6) match {
      case 0 => IntVal(rnd.nextLong())
      case 1 => FloatVal(rnd.nextDouble() * 100 - 50)
      case 2 => TextVal(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      case 3 => BoolVal(rnd.nextBoolean())
      case 4 => BytesVal(Vector.fill(rnd.nextInt(8))(rnd.nextInt(256).toByte))
      case 5 => NullVal
    }

  private def randTree(depth: Int, mode: PNodeCodec.Mode): PNode = {
    val typed = mode == PNodeCodec.Mode.NamedTyped
    if (depth == 0 || rnd.nextInt(3) == 0) {
      val op = OpType.values(rnd.nextInt(OpType.values.size))
      val n = 1 + rnd.nextInt(4)
      val cs = Seq.fill(n)(randComparand(typed))
      mode match {
        case PNodeCodec.Mode.Indexed =>
          PredicateNode(rnd.nextInt(100), None, op, cs, typed)
        case _ =>
          PredicateNode(-1, Some("f" + rnd.nextInt(10)), op, cs, typed)
      }
    } else {
      ConjugateNode(rnd.nextBoolean(),
        Seq.fill(1 + rnd.nextInt(3))(randTree(depth - 1, mode)))
    }
  }

  test("framed round trip: indexed dialect") {
    (0 until 100).foreach { _ =>
      val t = randTree(3, PNodeCodec.Mode.Indexed)
      assert(PNodeCodec.decodeFramed(PNodeCodec.encodeFramed(t, PNodeCodec.Mode.Indexed)) == t)
    }
  }

  test("framed round trip: named-typed dialect (0x02 0xFF leader)") {
    (0 until 100).foreach { _ =>
      val t = randTree(3, PNodeCodec.Mode.NamedTyped)
      val bytes = PNodeCodec.encodeFramed(t, PNodeCodec.Mode.NamedTyped)
      assert(bytes(0) == 0x02.toByte && bytes(1) == 0xff.toByte)
      assert(PNodeCodec.decodeFramed(bytes) == t)
    }
  }

  test("unframed round trip: named legacy dialect") {
    (0 until 100).foreach { _ =>
      val t = randTree(3, PNodeCodec.Mode.Named)
      assert(PNodeCodec.decode(PNodeCodec.encode(t, PNodeCodec.Mode.Named), PNodeCodec.Mode.Named) == t)
    }
  }

  test("byte layout matches the reference spec for a known tree") {
    // PredicateNode(field=3, GT, [42]) indexed:
    // [PRED=0][field=3][op GT=0][n=1 LE16][42 LE64]
    val bytes = PNodeCodec.encode(PredicateNode.indexed(3, OpType.GT, 42L), PNodeCodec.Mode.Indexed)
    assert(bytes.toSeq == Seq[Byte](0, 3, 0, 1, 0, 42, 0, 0, 0, 0, 0, 0, 0))
    // AND(two preds) leads with [AND=1][count=2]
    val and = PNodeCodec.encode(
      ConjugateNode.and(PredicateNode.indexed(0, OpType.EQ, 1L), PredicateNode.indexed(1, OpType.NE, 2L)),
      PNodeCodec.Mode.Indexed)
    assert(and(0) == 1 && and(1) == 2)
  }

  test("bad dialect leader rejected") {
    intercept[IllegalArgumentException](PNodeCodec.decodeFramed(Array[Byte](0x01, 0, 0)))
  }

  test("json round trip (predicate_format_v1.md)") {
    (0 until 100).foreach { _ =>
      // json dialect: no bytes comparands
      val t0 = randTree(3, PNodeCodec.Mode.NamedTyped)
      def clean(n: PNode): PNode = n match {
        case ConjugateNode(a, cs) => ConjugateNode(a, cs.map(clean))
        case p: PredicateNode =>
          p.copy(comparands = p.comparands.map {
            case BytesVal(_) => IntVal(0)
            case c           => c
          })
      }
      val t = clean(t0)
      assert(PNodeJson.parse(PNodeJson.render(t)) == t)
    }
  }

  test("json numeric-field indexed example from the spec") {
    val t = PNodeJson.parse("""{"field":1,"op":"IN","values":[3,4,5]}""")
    assert(t == PredicateNode(1, None, OpType.IN,
      Seq(IntVal(3), IntVal(4), IntVal(5)), typed = false))
    val sym = PNodeJson.parse("""{"field":0,"op":"=","values":[123]}""")
    assert(sym == PredicateNode(0, None, OpType.EQ, Seq(IntVal(123)), typed = false))
  }
}
