package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Learned-path RVQ contracts (the oracled deterministic twin is
  * q281–q283): sequential-KMeans stages must strictly shrink the residual,
  * the ADC table decomposition must equal the direct reconstruction
  * distance, encode must stay a pure map job, and malformed codebooks must
  * fail loudly.
  */
class RvqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  // 8 well-separated cluster centers + deterministic per-vector jitter:
  // stage 1 should capture the centers, stage 2 the jitter shell
  private def vec(i: Long): Array[Float] = {
    val c = (i % 8).toInt
    Array.tabulate(dim) { j =>
      val center = if (j % 8 == c) 4f else 0f
      val jit = ((graft.functions.StableHash.fnv64(s"rvq:$i:$j") >>> 12).toDouble /
        (1L << 52) * 2 - 1).toFloat
      center + 0.3f * jit
    }
  }

  private lazy val base = (0L until 256L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")

  test("learned stages strictly shrink the residual (3-stage descent)") {
    val cbs = Rvq.trainStageCodebooks(base, stages = 3, k = 8)
    val card = Rvq.errorCard(base, cbs).orderBy("stage")
      .select("mse").as[Double].collect()
    assert(card.length == 3)
    assert(card(1) < card(0) * 0.95, s"stage 2 must cut error: ${card.toSeq}")
    assert(card(2) < card(1) * 0.95, s"stage 3 must cut error: ${card.toSeq}")
  }

  test("ADC table decomposition equals the direct reconstruction distance") {
    val cbs = Rvq.trainStageCodebooks(base, stages = 2, k = 8)
    val codes = Rvq.encode(base, cbs)
    val queries = base.filter(col("vec_id") < 5)
    val adc = Rvq.adcSearch(queries, codes, cbs, k = 256)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    val books = cbs.select(col("stage").cast("int"), col("code").cast("int"),
        col("centroid").cast("array<float>"))
      .as[(Int, Int, Array[Float])].collect()
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.sortBy(_._2).map(_._3)
      }
    val codeMap = codes.select(col("id"), col("codes"))
      .as[(Long, Array[Int])].collect().toMap
    val qvs = queries.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    var checked = 0
    for ((qid, qv) <- qvs; (nid, cs) <- codeMap) {
      val recon = new Array[Double](dim)
      for (s <- cs.indices; j <- 0 until dim) recon(j) += books(s)(cs(s))(j).toDouble
      var d2 = 0.0
      for (j <- 0 until dim) { val t = qv(j).toDouble - recon(j); d2 += t * t }
      val want = math.sqrt(d2)
      val got = adc((qid, nid))
      assert(math.abs(got - want) < 1e-9,
        s"(q=$qid,n=$nid): adc $got != direct $want")
      checked += 1
    }
    assert(checked == 5 * 256)
  }

  test("encode executes with ZERO shuffle exchanges (pure map job)") {
    val cbs = Rvq.trainStageCodebooks(base, stages = 2, k = 8)
    val enc = Rvq.encode(base, cbs)
    enc.collect()
    assert(shuffleCount(finalPlan(enc)) == 0,
      s"encode must be map-side:\n${enc.queryExecution.executedPlan}")
  }

  test("ADC recall vs exact KNN is substantial on clustered data") {
    val cbs = Rvq.trainStageCodebooks(base, stages = 2, k = 16)
    val codes = Rvq.encode(base, cbs)
    val queries = base.filter(col("vec_id") < 20)
    val adc = Rvq.adcSearch(queries, codes, cbs, k = 10, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = Knn.knn(queries, base, k = 10, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (q, t) => (adc.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.3, s"avg recall@10 $avg too low for clustered data")
  }

  test("malformed codebooks fail loudly") {
    val sparse = Seq((0, 0, Seq.fill(dim)(0f)), (0, 2, Seq.fill(dim)(1f)))
      .toDF("stage", "code", "centroid")
    val e1 = intercept[IllegalArgumentException](Rvq.encode(base, sparse))
    assert(e1.getMessage.contains("not dense"))
    val e2 = intercept[IllegalArgumentException](
      Rvq.subsetStageCodebooks(base.filter(col("vec_id") < 10), Seq(4, 4)))
    assert(e2.getMessage.contains("need exactly"))
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def shuffleCount(plan: SparkPlan): Int =
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum +
      plan.toString.linesIterator
        .count(l => l.contains("ShuffleQueryStage") && !l.contains("Reused"))
}
