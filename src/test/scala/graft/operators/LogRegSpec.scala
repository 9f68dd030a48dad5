package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Full-batch GD logistic regression: must match a sequential reference
  * step-for-step (same rounding), be partition-count independent, and
  * actually separate separable data.
  */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // y = 1 iff x1 + x2 > 1, with a margin — linearly separable
  private val pts = (0 until 200).map { i =>
    val x1 = (i % 20) / 20.0
    val x2 = ((i * 7) % 20) / 20.0
    val y = if (x1 + x2 > 1.25) 1.0 else if (x1 + x2 < 0.75) 0.0 else -1.0
    (i.toLong, y, x1, x2)
  }.filter(_._2 >= 0)
  private def df = pts.toDF("id", "y", "x1", "x2")

  /** Sequential reference of the documented update rule. */
  private def refTrain(steps: Int, lr: Double): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until steps) {
      val grads = Array(0.0, 0.0, 0.0)
      pts.foreach { case (_, y, x1, x2) =>
        val e = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2))) - y
        grads(0) += e; grads(1) += e * x1; grads(2) += e * x2
      }
      w = Array.tabulate(3)(j =>
        math.rint((w(j) - lr * grads(j) / pts.size) * 1e6) / 1e6)
    }
    w
  }

  test("train equals the sequential reference step-for-step") {
    for (steps <- Seq(1, 3, 10)) {
      val got = LogReg.train(df, Seq("x1", "x2"), "y", steps, lr = 2.0)
      assert(got.toSeq == refTrain(steps, 2.0).toSeq, s"steps=$steps")
    }
  }

  test("weights are independent of the partition count") {
    val a = LogReg.train(df.repartition(1), Seq("x1", "x2"), "y", 5, 1.0)
    val b = LogReg.train(df.repartition(13), Seq("x1", "x2"), "y", 5, 1.0)
    assert(a.toSeq == b.toSeq)
  }

  test("separable data: 200 steps classify the margin sides correctly") {
    val w = LogReg.train(df, Seq("x1", "x2"), "y", steps = 200, lr = 5.0)
    val scored = LogReg.score(df, "id", Seq("x1", "x2"), w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val acc = pts.count { case (id, y, _, _) =>
      (scored(id) >= 0.5) == (y == 1.0)
    }.toDouble / pts.size
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("score equals the driver-side sigmoid of the same weights") {
    val w = LogReg.train(df, Seq("x1", "x2"), "y", 3, 1.0)
    val got = LogReg.score(df, "id", Seq("x1", "x2"), w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pts.foreach { case (id, _, x1, x2) =>
      val want = math.rint(1.0 / (1.0 +
        math.exp(-(w(0) + w(1) * x1 + w(2) * x2))) * 1e6) / 1e6
      assert(got(id) == want, s"id=$id")
    }
  }

  test("trainDf emits (idx, weight) with the bias at idx 0") {
    val w = LogReg.train(df, Seq("x1", "x2"), "y", 2, 1.0)
    val rows = LogReg.trainDf(df, Seq("x1", "x2"), "y", 2, 1.0)
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
  }

  test("guards: empty features, bad steps, weight arity") {
    intercept[IllegalArgumentException](LogReg.train(df, Nil, "y", 1, 1.0))
    intercept[IllegalArgumentException](LogReg.train(df, Seq("x1"), "y", 0, 1.0))
    intercept[IllegalArgumentException](
      LogReg.score(df, "id", Seq("x1", "x2"), Array(0.0, 0.0)))
  }

  test("binaryMetrics: confusion counts and derived ratios, boundary at >=") {
    import spark.implicits._
    val scored = Seq((0.9, 1.0), (0.6, 0.0), (0.5, 1.0), (0.4, 1.0), (0.1, 0.0))
      .toDF("score", "y")
    val m = LogReg.binaryMetrics(scored, "y", "score", threshold = 0.5).head()
    // preds: 1,1,1(>= boundary),0,0 -> tp=2 fp=1 fn=1 tn=1
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) == ((2L, 1L, 1L, 1L)))
    assert(m.getAs[Double]("precision") == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(m.getAs[Double]("recall") == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(m.getAs[Double]("f1") == math.rint(4.0 / 6 * 1e6) / 1e6)
    assert(m.getAs[Double]("accuracy") == 0.6)
    // degenerate: no positive predictions -> precision/recall 0, not NaN
    val none = LogReg.binaryMetrics(
      Seq((0.1, 1.0), (0.2, 0.0)).toDF("score", "y"), "y", "score").head()
    assert(none.getAs[Double]("precision") == 0.0 &&
      none.getAs[Double]("recall") == 0.0 && none.getAs[Double]("f1") == 0.0)
  }

  test("binaryMetrics on an EMPTY scored frame is all-zero, never null") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("score", "y")
    val m = LogReg.binaryMetrics(empty, "y", "score").head()
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) ==
      ((0L, 0L, 0L, 0L)))
    Seq("precision", "recall", "f1", "accuracy").foreach { c =>
      assert(!m.isNullAt(m.fieldIndex(c)), s"$c must not be null")
      assert(m.getAs[Double](c) == 0.0, s"$c must be 0.0")
    }
  }
}
