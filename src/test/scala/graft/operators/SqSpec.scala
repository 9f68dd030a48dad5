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
}
