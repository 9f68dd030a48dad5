package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed logistic regression — the model-based quality
  * classifier stage of an LLM data pipeline (the fastText-style filter:
  * score every document against a trained "high quality" model, keep by
  * threshold). Linear model + engine-neutral math keeps BOTH training and
  * scoring replayable by any SQL engine, which is what lets the oracle
  * check the full train→score composition.
  *
  * Scale shape: full-batch gradient descent — each step is ONE
  * `treeAggregate` over the feature relation whose task state is d+1
  * doubles (the gradient + count); the corpus never shuffles and the
  * weight vector broadcasts back implicitly as literals in the next
  * step's closure. Steps are a short driver loop (tens), the classic
  * batch-GD regime — for corpus-scale fitting the cost is `steps` scans,
  * embarrassingly map-side. Scoring is a pure projection.
  *
  * Determinism: the treeAggregate's double-summation order is
  * partition-dependent, so each step's updated weights are ROUNDED to 6
  * decimals (the `Clustering.lloyd` / `Pca` convention) — one weight
  * vector per (data, steps, lr) regardless of partitioning, and the same
  * numbers any engine's `avg` reproduces at 6 decimals.
  */
object LogReg {

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Train `steps` full-batch GD steps from w=0 (bias first, then one
    * weight per feature column): w ← round6(w − lr · avg((σ(w·x)−y)·x)).
    * Returns the weight vector (length = 1 + #features).
    */
  def train(df: DataFrame, featCols: Seq[String], labelCol: String,
      steps: Int, lr: Double): Array[Double] = {
    require(featCols.nonEmpty, "logreg needs at least one feature column")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = df.sparkSession
    import spark.implicits._
    val d = featCols.length
    val rows = df.select(array(
        (col(labelCol).cast("double") +: featCols.map(c => col(c).cast("double"))): _*).as("a"))
      .as[Array[Double]].rdd
      .map(a => (a.head, a.tail))
    rows.cache()
    try {
      var w = new Array[Double](d + 1) // bias at 0
      var step = 0
      while (step < steps) {
        val wCur = w
        val (grad, n) = rows.treeAggregate((new Array[Double](d + 1), 0L))(
          seqOp = { case ((g, c), (y, x)) =>
            var z = wCur(0)
            var j = 0
            while (j < d) { z += wCur(j + 1) * x(j); j += 1 }
            val e = sigmoid(z) - y
            g(0) += e
            j = 0
            while (j < d) { g(j + 1) += e * x(j); j += 1 }
            (g, c + 1)
          },
          combOp = { case ((g1, c1), (g2, c2)) =>
            var j = 0
            while (j < g1.length) { g1(j) += g2(j); j += 1 }
            (g1, c1 + c2)
          })
        require(n > 0, "logreg: empty training relation")
        w = Array.tabulate(d + 1)(j =>
          math.rint((wCur(j) - lr * grad(j) / n) * 1e6) / 1e6)
        step += 1
      }
      w
    } finally rows.unpersist(blocking = false)
  }

  /** [[train]] as a relation: (idx, weight) with idx 0 = bias — the
    * engine-neutral model table the oracle replays and the CLI emits.
    */
  def trainDf(df: DataFrame, featCols: Seq[String], labelCol: String,
      steps: Int, lr: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, featCols, labelCol, steps, lr).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("idx", "weight")
  }

  /** Score rows with a trained weight vector: (idCol, score) with score =
    * round6(σ(w·x)) — a pure projection (batch- and stream-composable).
    */
  /** Binary classification metrics at a threshold — the eval artifact a
    * filter-stage classifier ships with: one row of (tp, fp, fn, tn,
    * precision, recall, f1, accuracy), 6-rounded, zero-denominator cases
    * scoring 0.0. ONE aggregate over the scored frame; the count
    * arithmetic is integer-exact so the derived ratios are bit-identical
    * across engines.
    */
  def binaryMetrics(scored: DataFrame, labelCol: String, scoreCol: String,
      threshold: Double = 0.5): DataFrame = {
    val y = col(labelCol).cast("double")
    val p = (col(scoreCol).cast("double") >= threshold).cast("long")
    // coalesce(0): sum over an empty frame is NULL, but the metrics row
    // must be total — an empty corpus scores all-zero counts and 0.0 ratios
    scored.agg(
        coalesce(sum(p * y.cast("long")), lit(0L)).as("tp"),
        coalesce(sum(p * (lit(1L) - y.cast("long"))), lit(0L)).as("fp"),
        coalesce(sum((lit(1L) - p) * y.cast("long")), lit(0L)).as("fn"),
        coalesce(sum((lit(1L) - p) * (lit(1L) - y.cast("long"))), lit(0L))
          .as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(when(col("tp") + col("fp") === 0L, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))), 6)
          .as("precision"),
        round(when(col("tp") + col("fn") === 0L, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))), 6)
          .as("recall"),
        round(when(col("tp") * 2 + col("fp") + col("fn") === 0L, 0.0)
          .otherwise(col("tp").cast("double") * 2 /
            (col("tp") * 2 + col("fp") + col("fn"))), 6).as("f1"),
        round(when(col("tp") + col("fp") + col("fn") + col("tn") === 0L, 0.0)
          .otherwise((col("tp") + col("tn")).cast("double") /
            (col("tp") + col("fp") + col("fn") + col("tn"))), 6)
          .as("accuracy"))
  }

  def score(df: DataFrame, idCol: String, featCols: Seq[String],
      weights: Array[Double]): DataFrame = {
    require(weights.length == featCols.length + 1,
      s"weights length ${weights.length} != 1 + ${featCols.length} features")
    val z = featCols.zipWithIndex
      .map { case (c, j) => col(c).cast("double") * weights(j + 1) }
      .foldLeft(lit(weights(0)): Column)(_ + _)
    df.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"))
  }
}
