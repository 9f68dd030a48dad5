package graft.operators

import graft.SparkSpec

/** MMR: pure-relevance reduction at λ=1, redundancy suppression, negative
  * similarity as a reward, id tie-breaks, brute-force parity, and the
  * candidate bound.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Double, Array[Float])]) =
    rows.toDF("q", "id", "rel", "vec")

  test("lambda=1 is plain top-k by relevance (ties by id)") {
    val v = Array(1f, 0f)
    val in = df(Seq((1L, 10L, 0.5, v), (1L, 11L, 0.9, v),
      (1L, 12L, 0.9, v), (1L, 13L, 0.1, v)))
    val got = Mmr.mmrSelect(in, "q", "id", "rel", "vec", lambda = 1.0, k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((11L, 1), (12L, 2), (10L, 3)))
  }

  test("a redundant near-duplicate of the top pick is deferred behind a diverse candidate") {
    val a = Array(1f, 0f, 0f)
    val c = Array(0f, 1f, 0f) // orthogonal to a
    val in = df(Seq(
      (7L, 1L, 0.90, a),  // top relevance
      (7L, 2L, 0.89, a),  // near-identical content, sim(a,a)=1
      (7L, 3L, 0.50, c))) // diverse
    val got = Mmr.mmrSelect(in, "q", "id", "rel", "vec", lambda = 0.5, k = 2)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("negative similarity to the selected set REWARDS (penalty is the true max, not 0)") {
    val a = Array(1f, 0f)
    val anti = Array(-1f, 0.0001f) // sim to a ~ -1
    val ortho = Array(0f, 1f)      // sim to a = 0
    val in = df(Seq(
      (1L, 1L, 0.9, a),
      (1L, 2L, 0.2, anti),   // score_2 = .5*.2 - .5*(-1) = 0.6
      (1L, 3L, 0.5, ortho))) // score_2 = .5*.5 - 0 = 0.25
    val got = Mmr.mmrSelect(in, "q", "id", "rel", "vec", lambda = 0.5, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(math.abs(got(1)._2 - 0.6) < 1e-4)
  }

  test("matches a brute-force greedy replay on a deterministic corpus") {
    val rows = for (q <- 0L until 3L; i <- 0L until 12L) yield {
      val vec = Array.tabulate(5)(d =>
        math.sin(q * 31 + i * 7 + d * 3).toFloat)
      (q, 100 + i, math.abs(math.cos(q * 13 + i * 5)), vec)
    }
    val lambda = 0.6; val k = 4
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def sim(a: Array[Float], b: Array[Float]) = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val want = rows.groupBy(_._1).toSeq.flatMap { case (q, cs0) =>
      var rest = cs0.sortBy(_._2).toList
      var selected = List.empty[(Long, Long, Double, Array[Float])]
      (1 to k).map { r =>
        val scored = rest.map { c =>
          val pen = if (selected.isEmpty) 0.0
            else selected.map(s => sim(c._4, s._4)).max
          (c, r6(lambda * r6(c._3) - (1 - lambda) * pen))
        }
        val (bc, bs) = scored.maxBy { case (c, s) => (s, -c._2.toDouble) }
        rest = rest.filterNot(_._2 == bc._2)
        selected ::= bc
        (q, bc._2, r, bs)
      }
    }.toSet
    val got = Mmr.mmrSelect(df(rows), "q", "id", "rel", "vec", lambda, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got == want)
  }

  test("candidates with null relevance or vector are dropped, not crashed on") {
    val v = Array(1f, 0f)
    val in = Seq(
      (1L, 1L, Some(0.9), Some(v)),
      (1L, 2L, None, Some(v)),
      (1L, 3L, Some(0.5), Option.empty[Array[Float]]))
      .toDF("q", "id", "rel", "vec")
    val got = Mmr.mmrSelect(in, "q", "id", "rel", "vec", 0.5, 3)
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L))
  }

  test("maxCandidates bound rejects an unbounded retrieval stage") {
    val v = Array(1f)
    val in = df((0L until 20L).map(i => (1L, i, 0.5, v)))
    val e = intercept[org.apache.spark.SparkException] {
      Mmr.mmrSelect(in, "q", "id", "rel", "vec", 0.5, 2, maxCandidates = 10).collect()
    }
    assert(e.getMessage.contains("maxCandidates") ||
      e.getCause != null && e.getCause.getMessage.contains("maxCandidates"))
  }
}
