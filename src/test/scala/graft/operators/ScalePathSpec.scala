package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-2 scale-path guards: the df-capped Jaccard candidate generator
  * (skew protection + result equivalence), the bucketed embedding near-dup
  * recall, and the approximate-quantile bounds.
  */
class ScalePathSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dfCap: capped Jaccard equals the exact form on a normal corpus") {
    val docs = docsDf((0L until 40L).map { i =>
      // family of near-dups in groups of 4 + unique tail per doc
      val fam = i / 4
      val words = (0 until 12).map(w => s"w${fam}_$w") :+ s"uniq$i" :+ s"tail${i % 3}"
      (i, words.mkString(" "))
    })
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4,
      dfCap = 8).select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(capped == exact)
  }

  test("dfCap: a shingle present in EVERY doc does not enter candidate generation") {
    // 200 docs all sharing one boilerplate trigram: uncapped candidates are
    // ~n²/2 from that single posting; capped must prune it entirely
    val docs = docsDf((0L until 200L).map { i =>
      (i, s"common boiler plate unique${i}a unique${i}b unique${i}c")
    })
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3,
      dfCap = 50)
    // no pair shares a sub-cap shingle → zero candidates → zero pairs
    assert(capped.count() == 0)
    // sanity: the uncapped form would have had to consider ~19900 candidate
    // pairs from the hot shingle (all with tiny true Jaccard)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
    assert(exact.count() == 0)
  }

  test("bucketed embedding near-dup finds every planted pair (recall = 1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 300L).map(i => (i, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val planted = (0L until 30L).map { i =>
      (i + 1000L, base(i.toInt)._2.map(x => x * 0.95f + 0.005f))
    }
    val embs = (base ++ planted).toDF("vec_id", "embedding")
    val truth = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDupPairsBucketed(embs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 30)
    assert(bucketed == truth)
  }

  test("quantilesApprox stays within the sketch rank-error bound of exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(20000)(rnd.nextDouble() * 1000.0).toDF("v")
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val exact = ProfileStats.quantiles(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val approx = ProfileStats.quantilesApprox(df, col("v"), ps, accuracy = 1000)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // value-level check: rank error 1/1000 on U(0,1000) ≈ ±1.0 in value;
    // allow 3× for interpolation slack
    ps.foreach { p => assert(math.abs(exact(p) - approx(p)) < 3.0, s"p=$p") }
  }

  test("quantilesApproxByDim: one sketch per dim, no global buffer") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i, Array(i.toFloat, (1000 - i).toFloat)))
      .toDF("id", "vec")
    val q = ProfileStats.quantilesApproxByDim(df, "vec", Seq(0.5))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).head).toMap
    assert(math.abs(q(0) - 500.0) < 5.0)
    assert(math.abs(q(1) - 500.0) < 5.0)
  }

  test("trainCentroids samples before fitting and still covers the space") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 4 well-separated clusters, 500 points each
    val pts = (0 until 2000).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8)(d =>
        (c * 10.0 + rnd.nextGaussian() * 0.1 + (if (d == 0) c * 5 else 0)).toFloat))
    }.toDF("vec_id", "embedding")
    // samplePerCell=100 → target 400 < 2000 rows → the sampler must engage
    val cents = Ann.trainCentroids(spark, pts, nList = 4, samplePerCell = 100)
    assert(cents.count() == 4)
    // every point lands in a cell whose centroid is its own cluster center:
    // distances between cluster centers are >> intra-cluster spread
    val idx = Ann.ivfIndex(pts, cents, metric = "EUCLIDEAN")
    val cellsPerCluster = idx
      .select((col("id") % 4).as("cluster"), col("cell"))
      .distinct().groupBy("cluster").count().collect()
    cellsPerCluster.foreach(r => assert(r.getLong(1) == 1, s"cluster split: $r"))
  }
}
