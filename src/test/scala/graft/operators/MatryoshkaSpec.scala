package graft.operators

import graft.SparkSpec

/** Matryoshka sweep contracts: full-dim recall is exactly 1, recall is
  * (weakly) monotone when information is head-loaded, and truncation to
  * a prefix that carries all the signal loses nothing.
  */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  // head-loaded vectors: dims 0-3 carry cluster structure, the tail is a
  // deterministic low-amplitude hash wiggle
  private def vec(i: Long, dim: Int): Array[Float] = {
    val cluster = (i % 8).toInt
    Array.tabulate(dim) { d =>
      if (d < 4) (if ((cluster >> (d % 3)) % 2 == 0) 1f else -1f)
      else ((i * 31 + d * 17) % 7 - 3) * 0.02f
    }
  }

  private lazy val emb = (0L until 120L).map(i => (i, vec(i, 32)))
    .toDF("vec_id", "embedding").cache()

  test("full-dimension truncation reproduces the truth exactly (recall 1)") {
    val q = emb.filter($"vec_id" < 10)
    val b = emb.filter($"vec_id" >= 10)
    val curve = Matryoshka.recallCurve(q, b, Seq(32), k = 5)
      .as[(Int, Double)].collect().toMap
    assert(curve(32) == 1.0, curve.toString)
  }

  test("empty query frame returns the empty curve, not an exception") {
    val q = emb.filter($"vec_id" < 0)
    val b = emb.filter($"vec_id" >= 10)
    val curve = Matryoshka.recallCurve(q, b, Seq(4, 32), k = 5)
    assert(curve.columns.toSeq == Seq("dims", "avg_recall"))
    assert(curve.count() == 0)
  }

  test("head-loaded embeddings: early prefix already near-perfect, curve monotone-ish") {
    val q = emb.filter($"vec_id" < 10)
    val b = emb.filter($"vec_id" >= 10)
    val curve = Matryoshka.recallCurve(q, b, Seq(2, 8, 32), k = 5)
      .as[(Int, Double)].collect().toMap
    assert(curve(8) >= curve(2) - 0.05, s"rough monotonicity: $curve")
    assert(curve(32) == 1.0)
    assert(curve(8) > 0.5, s"signal lives in the head: $curve")
  }
}
