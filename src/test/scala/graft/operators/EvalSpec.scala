package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Eval cards: ROC-AUC against hand-computed rank statistics (including
  * ties and degenerate one-class frames), calibration bins + ECE against
  * closed-form expectations, and the prefix-sum primitive they ride on.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("exclusivePrefixSum equals the sequential scan at any partitioning") {
    val rows = (1 to 97).map(i => (i.toLong, (i % 7 + 1).toLong))
    for (parts <- Seq(1, 3, 16)) {
      val got = Ranking.exclusivePrefixSum(
          rows.toDF("id", "v").repartition(5), Seq("id"), "v", "pre", parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      var run = 0L
      rows.foreach { case (id, v) =>
        assert(got(id) == run, s"id=$id parts=$parts")
        run += v
      }
    }
  }

  test("exclusivePrefixSum rejects an existing output column") {
    intercept[IllegalArgumentException] {
      Ranking.exclusivePrefixSum(Seq((1L, 2L)).toDF("id", "pre"),
        Seq("id"), "id", "pre")
    }
  }

  test("rocAuc: perfect, inverted, random, and tied rankings") {
    def auc(rows: Seq[(Double, Long)]): java.lang.Double = {
      val r = Eval.rocAuc(rows.toDF("s", "y"), "y", "s").collect()(0)
      if (r.isNullAt(2)) null else r.getDouble(2)
    }
    // perfect separation
    assert(auc(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))) == 1.0)
    // perfectly inverted
    assert(auc(Seq((0.1, 1L), (0.2, 1L), (0.8, 0L), (0.9, 0L))) == 0.0)
    // all scores tied -> 0.5 exactly
    assert(auc(Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L))) == 0.5)
    // hand-computed mixed case: pos {0.8, 0.4}, neg {0.6, 0.4, 0.2}
    // pairs: (0.8 beats all 3) + (0.4 beats 0.2 =1, ties 0.4 =0.5) = 4.5/6
    assert(auc(Seq((0.8, 1L), (0.4, 1L), (0.6, 0L), (0.4, 0L), (0.2, 0L)))
      == 0.75)
    // one-class frames: undefined -> NULL
    assert(auc(Seq((0.8, 1L), (0.3, 1L))) == null)
    assert(auc(Seq((0.8, 0L))) == null)
  }

  test("rocAuc matches a brute-force pair count on random data") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map { _ =>
      (math.rint(rnd.nextDouble() * 20) / 20.0, rnd.nextInt(2).toLong)
    }
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num = pos.iterator.map(p =>
      neg.count(_ < p) + neg.count(_ == p) * 0.5).sum
    val want = math.rint(num / (pos.size.toDouble * neg.size) * 1e6) / 1e6
    val got = Eval.rocAuc(rows.toDF("s", "y"), "y", "s").collect()(0).getDouble(2)
    assert(got == want)
  }

  test("calibration bins and ECE: closed-form two-bin case") {
    // bin 1 = [0.1, 0.2): scores 0.10/0.12, labels 1,0 -> frac 0.5
    // bin 9 (top, closed): scores 0.95/1.0, labels 1,1 -> frac 1.0
    val rows = Seq((0.10, 1L), (0.12, 0L), (0.95, 1L), (1.0, 1L))
    val bins = Eval.calibrationBins(rows.toDF("s", "y"), "y", "s", nBins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(bins.keySet == Set(1L, 9L))
    assert(bins(1L) == ((2L, 0.11, 0.5, 0.39)))
    assert(bins(9L) == ((2L, 0.975, 1.0, 0.025)))
    val e = Eval.ece(rows.toDF("s", "y"), "y", "s", nBins = 10).collect()(0)
    assert(e.getLong(0) == 4L)
    // (2*0.39 + 2*0.025) / 4 = 0.2075
    assert(e.getDouble(1) == 0.2075)
  }

  test("ECE of an empty frame is (0, 0.0) — the total contract") {
    val e = Eval.ece(Seq.empty[(Double, Long)].toDF("s", "y"), "y", "s")
      .collect()(0)
    assert(e.getLong(0) == 0L && e.getDouble(1) == 0.0)
  }

  test("youdenThreshold picks the separating threshold on a separable set") {
    // positives score >= 0.8, negatives <= 0.3: t = 0.8 gives J = 1
    val scored = Seq((0.9, 1L), (0.8, 1L), (0.3, 0L), (0.1, 0L), (0.2, 0L))
      .toDF("s", "y")
    val r = Eval.youdenThreshold(scored, "y", "s").collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((0.8, 1.0, 0.0, 1.0)))
  }

  test("youdenThreshold matches a brute-force scan and breaks J ties upward") {
    val rng = (1 to 60).map { i =>
      val s = math.rint(math.abs(math.sin(i * 7.0)) * 100) / 100
      (s, if (math.cos(i * 3.0) > -0.2) 1L else 0L)
    }
    val got = Eval.youdenThreshold(rng.toDF("s", "y"), "y", "s").collect()(0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val nPos = rng.count(_._2 == 1L); val nNeg = rng.size - nPos
    val want = rng.map(_._1).distinct.map { t =>
      val tp = rng.count(p => p._1 >= t && p._2 == 1L)
      val fp = rng.count(p => p._1 >= t && p._2 == 0L)
      (t, r6(r6(tp.toDouble / nPos) - r6(fp.toDouble / nNeg)))
    }.maxBy { case (t, j) => (j, t) }
    assert((got.getDouble(0), got.getDouble(3)) == want)
  }

  test("youdenThreshold is empty when a class is absent (undefined rates)") {
    val onlyPos = Seq((0.9, 1L), (0.2, 1L)).toDF("s", "y")
    assert(Eval.youdenThreshold(onlyPos, "y", "s").count() == 0L)
  }

  test("mrrNdcgAtK matches hand-computed values on a planted ranking") {
    // q1: relevant {10, 11}; hits at ranks 1 and 3 of 3.
    //   mrr = 1/1; dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1 + 1/log2(3)
    // q2: relevant {20}; hit at rank 2.
    //   mrr = 1/2; dcg = 1/log2(3); idcg = 1
    // q3: relevant {30}; NO hit in the list. mrr = 0; ndcg = 0
    val ranked = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 20L, 2), (2L, 97L, 3),
      (3L, 96L, 1), (3L, 95L, 2)
    ).toDF("query_id", "neighbor_id", "rank")
    val relevant = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val row = Eval.mrrNdcgAtK(ranked, relevant, k = 3).collect()(0)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val log2 = (x: Double) => math.log(x) / math.log(2)
    val ndcg1 = 1.5 / (1.0 + 1.0 / log2(3))
    val ndcg2 = 1.0 / log2(3)
    assert(row.getLong(0) == 3)
    assert(row.getDouble(1) == r4((1.0 + 0.5 + 0.0) / 3))
    assert(row.getDouble(2) == r4((ndcg1 + ndcg2 + 0.0) / 3))

    // a perfect ranking scores 1.0 on both
    val perfect = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "neighbor_id", "rank")
    val perfRel = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "neighbor_id")
    val p = Eval.mrrNdcgAtK(perfect, perfRel, k = 3).collect()(0)
    assert(p.getDouble(1) == 1.0 && p.getDouble(2) == 1.0)
  }
}
