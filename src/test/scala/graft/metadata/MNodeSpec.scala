package graft.metadata

import org.scalatest.funsuite.AnyFunSuite

class MNodeSpec extends AnyFunSuite {
  import MValue._

  private val rnd = new scala.util.Random(23)

  private def randValue(depth: Int): MValue = {
    val scalarGens: Seq[() => MValue] = Seq(
      () => Str(rnd.alphanumeric.take(rnd.nextInt(10)).mkString),
      () => I64(rnd.nextLong()),
      () => F64(rnd.nextDouble() * 100),
      () => Bool(rnd.nextBoolean()),
      () => Bytes(Vector.fill(rnd.nextInt(8))(rnd.nextInt(256).toByte)),
      () => Null,
      () => EnumStr("E" + rnd.nextInt(5)),
      () => EnumOrd(rnd.nextInt(10)),
      () => Text("t" + rnd.nextInt(100)),
      () => Ascii("ascii" + rnd.nextInt(10)),
      () => I32(rnd.nextInt()),
      () => I16(rnd.nextInt(Short.MaxValue).toShort),
      () => Dec(BigDecimal(BigInt(rnd.nextLong()), rnd.nextInt(10))),
      () => VarInt(BigInt(rnd.nextLong()) * BigInt(rnd.nextLong())),
      () => F32(rnd.nextFloat()),
      () => F16(graft.functions.Half.toFloat(rnd.nextInt(0x7c00).toShort)), // finite f16
      () => Millis(rnd.nextLong() % 4102444800000L),
      () => Nanos(rnd.nextLong() % 4102444800L, rnd.nextInt(1000000000)),
      () => Date("2024-03-15"),
      () => Time("12:34:56"),
      () => DateTime("2024-03-15T12:34:56Z"),
      () => UuidV1(rnd.nextLong(), rnd.nextLong()),
      () => UuidV7(rnd.nextLong(), rnd.nextLong()),
      () => UlidVal(Vector.fill(16)(rnd.nextInt(256).toByte)))
    if (depth <= 0) scalarGens(rnd.nextInt(scalarGens.size))()
    else rnd.nextInt(5) match {
      case 0 => MList(Seq.fill(rnd.nextInt(4))(randValue(depth - 1)))
      case 1 => Node(randNode(depth - 1))
      case 2 => TypedArray(1, Seq.fill(rnd.nextInt(4))(I64(rnd.nextLong())))
      case 3 => MSet(Seq.fill(rnd.nextInt(4))(randValue(0)))
      case 4 => TypedMap(Seq.fill(rnd.nextInt(4))((Str("k" + rnd.nextInt(100)), randValue(0))))
    }
  }

  private def randNode(depth: Int): MNode =
    MNode((0 until rnd.nextInt(6)).map(i => s"f$i" -> randValue(depth)))

  test("round trip: 300 random records over all 29 tags") {
    (0 until 300).foreach { _ =>
      val n = randNode(2)
      assert(MNodeCodec.decode(MNodeCodec.encode(n)) == n)
      assert(MNodeCodec.decodeFramed(MNodeCodec.encodeFramed(n)) == n)
    }
  }

  test("dialect leader is 0x01 (distinguishes MNode from PNode 0x02 in ANode streams)") {
    val bytes = MNodeCodec.encode(MNode(Seq("a" -> I64(1))))
    assert(bytes(0) == 0x01.toByte)
  }

  test("layout round trip + StructType mapping + validation") {
    val layout = MetadataLayout(Seq(
      FieldDescriptor("name", FieldType.Text),
      FieldDescriptor("age", FieldType.IntT),
      FieldDescriptor("score", FieldType.FloatT),
      FieldDescriptor("active", FieldType.BoolT),
      FieldDescriptor("tier", FieldType.EnumT, Seq("gold", "silver", "bronze"))))
    assert(MetadataLayout.decode(layout.encode()) == layout)
    assert(layout.toStructType.fieldNames.toSeq ==
      Seq("name", "age", "score", "active", "tier"))
    assert(layout.resolve(4) == "tier")

    val good = MNode(Seq("name" -> Str("x"), "age" -> I32(7), "tier" -> EnumStr("gold")))
    assert(layout.validate(good).isEmpty)
    assert(layout.validate(MNode(Seq("tier" -> EnumStr("platinum")))).isDefined)
    assert(layout.validate(MNode(Seq("bogus" -> I64(1)))).isDefined)
    assert(layout.validate(MNode(Seq("age" -> Str("nan")))).isDefined)
  }

  test("toRow: layout-positional decode with promotion, enum ordinal resolution, missing=null") {
    val layout = MetadataLayout(Seq(
      FieldDescriptor("age", FieldType.IntT),
      FieldDescriptor("score", FieldType.FloatT),
      FieldDescriptor("tier", FieldType.EnumT, Seq("gold", "silver"))))
    val row = MNodeSpark.toRow(
      MNode(Seq("score" -> F32(1.5f), "tier" -> EnumOrd(1), "age" -> I16(9))), layout)
    assert(row.getLong(0) == 9L)
    assert(row.getDouble(1) == 1.5)
    assert(row.getString(2) == "silver")
    val sparse = MNodeSpark.toRow(MNode(Seq("age" -> I64(1))), layout)
    assert(sparse.isNullAt(1) && sparse.isNullAt(2))
  }

  test("ULID canonical codec (Crockford base32, confusables)") {
    val bytes = Ulid.of(1469922850259L, 0x1234.toShort, 0x56789abcdef01234L)
    val canonical = Ulid.toCanonical(bytes)
    assert(canonical.length == 26)
    assert(Ulid.fromCanonical(canonical).toSeq == bytes.toSeq)
    // i/l -> 1, o -> 0
    assert(Ulid.fromCanonical(canonical.toLowerCase).toSeq == bytes.toSeq)
    val zeros = Ulid.toCanonical(new Array[Byte](16))
    assert(zeros == "0" * 26)
    // Crockford confusables: O->0, I/L->1
    assert(Ulid.fromCanonical("0" * 23 + "O1I").toSeq ==
      Ulid.fromCanonical("0" * 23 + "011").toSeq)
    assert(Ulid.fromCanonical("0" * 23 + "0L0").toSeq ==
      Ulid.fromCanonical("0" * 23 + "010").toSeq)
  }
}
