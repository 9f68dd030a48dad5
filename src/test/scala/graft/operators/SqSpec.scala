package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scalar quantization: grid fit, exact round-trip on grid points, error
  * bound, degenerate dims, and code range.
  */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(i: Long): Array[Float] =
    Array.tabulate(dim) { j =>
      val h = graft.functions.StableHash.fnv64(s"sq:$i:$j")
      ((h >>> 12).toDouble / (1L << 52).toDouble * 4 - 2).toFloat
    }
  private lazy val base = (0L until 200L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
  private lazy val grid = Sq.fitGrid(base, dim = dim)

  test("grid holds per-dim extrema") {
    val r = grid.collect().head
    val mins = r.getSeq[Double](0)
    val maxs = r.getSeq[Double](1)
    val all = (0L until 200L).map(vec)
    for (j <- 0 until dim) {
      assert(math.abs(mins(j) - all.map(_(j).toDouble).min) < 1e-12)
      assert(math.abs(maxs(j) - all.map(_(j).toDouble).max) < 1e-12)
    }
  }

  test("codes are in [0, 255] and extrema map to the range ends") {
    val codes = Sq.encode(base, grid).as[(Long, Array[Short])].collect()
    assert(codes.length == 200)
    assert(codes.forall(_._2.forall(c => c >= 0 && c <= 255)))
    val all = codes.flatMap(_._2)
    assert(all.contains(0.toShort) && all.contains(255.toShort))
  }

  test("reconstruction error is within the grid-step bound") {
    val r = grid.collect().head
    val mins = r.getSeq[Double](0)
    val maxs = r.getSeq[Double](1)
    val bound = math.sqrt((0 until dim).map { j =>
      val step = (maxs(j) - mins(j)) / 255.0
      (step / 2) * (step / 2)
    }.sum) + 1e-9
    val errs = Sq.l2Error(base, grid).select("l2_err").as[Double].collect()
    assert(errs.length == 200)
    assert(errs.forall(_ <= bound), s"max err ${errs.max} > bound $bound")
  }

  test("grid points round-trip exactly") {
    // vectors whose components sit exactly on grid points: decode(encode) == id
    val r = grid.collect().head
    val mins = r.getSeq[Double](0)
    val maxs = r.getSeq[Double](1)
    val gp = (0 until 4).map { k =>
      (k.toLong, (0 until dim).map(j => (mins(j) + k * (maxs(j) - mins(j)) * 85 / 255.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    // components land on codes 0,85,170,255 — decode must reproduce them to f32 rounding
    val err = Sq.l2Error(gp, grid).select("l2_err").as[Double].collect()
    assert(err.forall(_ < 1e-6), s"grid-point errors: ${err.mkString(",")}")
  }

  test("degenerate constant dimension yields code 0 and exact reconstruction") {
    val const = (0L until 10L).map(i => (i, Seq.fill(dim)(3.25f))).toDF("vec_id", "embedding")
    val g = Sq.fitGrid(const, dim = dim)
    val codes = Sq.encode(const, g).as[(Long, Array[Short])].collect()
    assert(codes.forall(_._2.forall(_ == 0)))
    val errs = Sq.l2Error(const, g).select("l2_err").as[Double].collect()
    assert(errs.forall(_ == 0.0))
  }

  test("binarize packs the sign pattern, 16 dims per word, non-multiple dims included") {
    val v = Array(1f, -2f, 0f, -0.5f) ++ Array.fill(13)(1f) // 17 dims -> 2 words
    val words = Sq.binarize(Seq((7L, v)).toDF("vec_id", "embedding"))
      .collect()(0).getSeq[Long](1)
    assert(words.length == 2)
    // dims 0..16: signs 1,0,1(0f>=0),0, then 13 ones; word0 bits 0,2,4..15
    val expect0 = (0 until 16).map(i => if (v(i) >= 0f) 1L << i else 0L).sum
    assert(words(0) == expect0)
    assert(words(1) == 1L) // dim 16 positive
  }

  test("binaryTopK matches a brute-force XOR-popcount ranking") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Sq.binaryTopK(emb.filter(col("vec_id") < 5), emb, k = 4,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3)))
      .toMap
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bits(v: Array[Float]): Array[Long] = {
      val w = new Array[Long]((v.length + 15) / 16)
      v.indices.foreach(i => if (v(i) >= 0f) w(i / 16) |= 1L << (i % 16))
      w
    }
    for (q <- 0L until 5L) {
      val qb = bits(all(q))
      val ranked = all.toSeq.filter(_._1 != q).map { case (id, v) =>
        val bb = bits(v)
        (id, qb.indices.map(i => java.lang.Long.bitCount(qb(i) ^ bb(i))).sum.toLong)
      }.sortBy { case (id, h) => (h, id) }.take(4)
      ranked.zipWithIndex.foreach { case ((id, h), i) =>
        assert(got((q, i + 1)) == ((id, h)), s"query $q rank ${i + 1}")
      }
    }
  }

  test("binarizeExpr is bit-identical to the typed-map binarize") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val typed = Sq.binarize(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val expr = emb.select(col("vec_id"),
        Sq.binarizeExpr(col("embedding"), dim = 64).as("bits"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(expr == typed)
  }

  test("binaryTopKFiltered: pre-filter semantics; null blob == unfiltered") {
    import graft.predicates._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val blob = PNodeCodec.encodeFramed(
      PredicateNode.namedTyped("label", OpType.GE, Comparand.IntVal(5)),
      PNodeCodec.Mode.NamedTyped)
    val q = emb.filter(col("vec_id") < 5)
      .withColumn("predicate", udf(() => blob).apply())
    val out = Sq.binaryTopKFiltered(q, emb, k = 4, dim = 64,
        metadataCols = Seq("label"), excludeSelf = true)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
        "neighbor_id")
    val labs = out.select("label").collect().map(_.getInt(0))
    assert(labs.length == 20 && labs.forall(_ >= 5))

    val nullQ = emb.filter(col("vec_id") < 5)
      .withColumn("predicate", lit(null).cast("binary"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(Sq.binaryTopKFiltered(nullQ, emb, k = 4, dim = 64,
        metadataCols = Seq("label"), excludeSelf = true)) ==
      key(Sq.binaryTopK(emb.filter(col("vec_id") < 5), emb, k = 4,
        excludeSelf = true)))
  }
}
