package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.{Mixture, Sampling}

/** The stateless curation operators (split assignment, stratified sample,
  * mixture materialization) are pure projections/explodes, so they compose
  * with Structured Streaming unchanged — stream output must equal the batch
  * output row-for-row regardless of micro-batch boundaries, because every
  * decision is a deterministic function of the row alone.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private val batch1 = (0L until 150L).map(i => (i, if (i % 2 == 0) "en" else "de"))
  private val batch2 = (150L until 300L).map(i => (i, if (i % 3 == 0) "zh" else "en"))

  private def runStream(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): Set[Seq[Any]] = {
    val mem = MemoryStream[(Long, String)](spark)
    val q = f(mem.toDF().toDF("doc_id", "lang"))
    val query = q.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1: _*)
      query.processAllAvailable()
      mem.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()
    spark.table(name).collect().map(_.toSeq).toSet
  }

  test("assignSplit on a stream equals the batch assignment") {
    val streamed = runStream(
      df => Sampling.assignSplit(df, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)), "scs_split")
    val batch = Sampling.assignSplit((batch1 ++ batch2).toDF("doc_id", "lang"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 300)
  }

  test("stratifiedSample on a stream equals the batch sample") {
    val fracs = Map("en" -> 0.5, "de" -> 1.0)
    val streamed = runStream(
      df => Sampling.stratifiedSample(df, "lang", "doc_id", fracs), "scs_sample")
    val batch = Sampling.stratifiedSample((batch1 ++ batch2).toDF("doc_id", "lang"),
        "lang", "doc_id", fracs)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.size < 300) // en subsampled, zh dropped
  }

  test("mixture materialization on a stream equals the batch mixture") {
    val factors = Map("en" -> 1.5, "de" -> 2.0, "zh" -> 0.25)
    val streamed = runStream(
      df => Mixture.materialize(df, "lang", "doc_id", factors), "scs_mix")
    val batch = Mixture.materialize((batch1 ++ batch2).toDF("doc_id", "lang"),
        "lang", "doc_id", factors)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // de rows appear exactly twice (epochs 0 and 1)
    assert(batch.count(r => r(1) == "de" && r(2) == 1L) ==
      batch.count(r => r(1) == "de" && r(2) == 0L))
  }

  test("bloom decontamination on a stream equals the batch scores") {
    import graft.operators.Bloom
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bits = Bloom.build(bench, "text", n = 3, mBits = 1 << 12, kProbes = 3)
    val docs = (0L until 120L).map { i =>
      (i, if (i % 5 == 0) "alpha beta gamma delta filler"
          else s"doc $i with its own content words w${i % 11} w${i % 13} tail")
    }
    val mem = MemoryStream[(Long, String)](spark)
    val q = Bloom.containmentScores(mem.toDF().toDF("doc_id", "text"), bits,
      "doc_id", "text", n = 3, kProbes = 3)
    val query = q.writeStream.format("memory").queryName("scs_bloom")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.take(60): _*)
      query.processAllAvailable()
      mem.addData(docs.drop(60): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("scs_bloom").collect().map(_.toSeq).toSet
    val batch = Bloom.containmentScores(docs.toDF("doc_id", "text"), bits,
        "doc_id", "text", n = 3, kProbes = 3)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 120)
    // the planted contaminated docs actually score above zero
    assert(batch.exists(r => r(1).asInstanceOf[Double] > 0.0))
  }

  test("CMS commonness scoring on a stream equals the batch scores") {
    import graft.operators.Cms
    val corpus = (0L until 100L).map(i =>
      (i, if (i % 2 == 0) "the the common words here" else s"rare token r$i only"))
    val corpusDf = corpus.toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{col, explode, lower, split}
    val toks = corpusDf.select(
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    val grid = Cms.build(toks, "term", depth = 3, width = 1 << 12)
    val mem = MemoryStream[(Long, String)](spark)
    val q = Cms.commonTokenFraction(mem.toDF().toDF("doc_id", "text"), grid,
      depth = 3, "doc_id", "text", threshold = 40L)
    val query = q.writeStream.format("memory").queryName("scs_cms")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(corpus.take(50): _*)
      query.processAllAvailable()
      mem.addData(corpus.drop(50): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("scs_cms").collect().map(_.toSeq).toSet
    val batch = Cms.commonTokenFraction(corpusDf, grid, depth = 3,
        "doc_id", "text", threshold = 40L)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 100)
    // template docs are all heavy hitters; rare docs carry one cold token
    val byId = batch.map(r => r.head.asInstanceOf[Long] ->
      r(1).asInstanceOf[Double]).toMap
    assert(byId(0L) == 1.0 && byId(1L) == 0.75)
  }

  test("interval join of a point stream against static intervals equals batch") {
    import graft.operators.IntervalJoin
    val ivs = (1L to 40L).map(i => (i, i % 3, i * 50, i * 50 + 80))
      .toDF("iid", "k", "s", "e")
    val points = (0L until 300L).map(i => (i % 3, (i * 13) % 2100))
    val mem = MemoryStream[(Long, Long)](spark)
    val q = IntervalJoin.pointInInterval(mem.toDF().toDF("k", "p"), ivs,
      "p", "s", "e", Seq("k"), bucketWidth = 64L)
      .select("iid", "k", "p")
    val query = q.writeStream.format("memory").queryName("scs_iv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(points.take(150): _*)
      query.processAllAvailable()
      mem.addData(points.drop(150): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("scs_iv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val batch = IntervalJoin.pointInInterval(points.toDF("k", "p"), ivs,
        "p", "s", "e", Seq("k"), bucketWidth = 64L)
      .select("iid", "k", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(streamed == batch && batch.nonEmpty)
  }

  test("cluster assignment on a stream equals the batch assignment") {
    // fixed centroids broadcast into the map-side argmin — a pure per-row
    // function, so online cluster routing composes with streaming unchanged
    val rnd = new scala.util.Random(23)
    val pts = (0L until 200L).map { i =>
      val c = if (i % 2 == 0) 0f else 6f
      (i, Array(c + rnd.nextGaussian().toFloat, c - rnd.nextGaussian().toFloat))
    }
    val init = pts.take(2).toDF("vec_id", "embedding")
      .select((org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
        .cast("long").as("cell"),
        org.apache.spark.sql.functions.col("embedding").as("centroid"))
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = graft.operators.Clustering.assign(
      mem.toDF().toDF("vec_id", "embedding"), init)
      .select("id", "cell")
    val query = q.writeStream.format("memory").queryName("scs_cluster")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(pts.take(80): _*)
      query.processAllAvailable()
      mem.addData(pts.drop(80): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("scs_cluster").collect().map(_.toSeq).toSet
    val batch = graft.operators.Clustering.assign(
        pts.toDF("vec_id", "embedding"), init)
      .select("id", "cell").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 200)
  }

  test("quantile bucketize on a stream equals batch, within ε of exact ntile") {
    import graft.operators.Ranking
    // deterministic distinct scores; thresholds from the mergeable approx
    // sketch (the GK-family state a progressive pipeline keeps folding),
    // then bucket assignment is a stateless per-row projection
    val scores = (0L until 400L).map(i =>
      (i, ((i * 2654435761L) % 100003).toDouble / 100))
    val k = 4
    val thresholds = Ranking.bucketThresholds(
        scores.toDF("doc_id", "score"), "score", k, exact = false)
      .orderBy("bucket").collect().map(_.getDouble(1)).toSeq
    val mem = MemoryStream[(Long, Double)](spark)
    val q = Ranking.bucketize(mem.toDF().toDF("doc_id", "score"),
      "score", thresholds)
    val query = q.writeStream.format("memory").queryName("scs_buckets")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(scores.take(150): _*)
      query.processAllAvailable()
      mem.addData(scores.drop(150): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("scs_buckets").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val batch = Ranking.bucketize(scores.toDF("doc_id", "score"),
        "score", thresholds)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(streamed == batch && batch.size == 400)
    // ε-closeness to the exact ANSI ntile: value-threshold buckets must hold
    // each bucket within rank error n/accuracy (+1 for the cut itself) of
    // the exact n/k ntile size
    val sizes = batch.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val eps = 400 / 10000 + 2
    (1 to k).foreach { b =>
      assert(math.abs(sizes.getOrElse(b.toLong, 0) - 400 / k) <= eps,
        s"bucket $b size ${sizes.get(b.toLong)} vs ${400 / k} ± $eps")
    }
    // streamed bucket of each row equals the threshold definition exactly
    val tmap = thresholds
    scores.foreach { case (id, v) =>
      val want = 1L + tmap.count(v > _)
      assert(streamed.contains((id, want)))
    }
  }
}
