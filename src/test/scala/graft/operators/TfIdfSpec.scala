package graft.operators

import graft.SparkSpec

/** Hand-computed TF-IDF and feature-hashing parity. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, ""), (4L, null: String))
    .toDF("doc_id", "text")

  test("tfidf equals the hand-computed smoothed-idf scores") {
    // N = 4 docs; df: a=2, b=1, c=1
    def idf(df: Int): Double = math.log(5.0 / (1 + df)) + 1
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TfIdf.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (1L, "a", 2L, r6(2 * idf(2))),
      (1L, "b", 1L, r6(idf(1))),
      (2L, "a", 1L, r6(idf(2))),
      (2L, "c", 1L, r6(idf(1)))))
  }

  test("minDf prunes the low-df vocabulary tail") {
    val got = TfIdf.tfidf(docs, "doc_id", "text", minDf = 2)
      .collect().map(_.getString(1)).toSet
    assert(got == Set("a")) // b and c have df 1
    intercept[IllegalArgumentException] {
      TfIdf.tfidf(docs, "doc_id", "text", minDf = 0)
    }
  }

  test("hashedTf buckets via md5-60 and preserves per-doc token mass") {
    val n = 64
    val got = TfIdf.hashedTf(docs, "doc_id", "text", nBuckets = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same engine-neutral hash as the dedup family
    def bucket(t: String): Long = {
      val h = graft.functions.StableHash.md5Hash60(t)
      ((h % n) + n) % n
    }
    val expected = Map(
      1L -> Map(bucket("a") -> 2L, bucket("b") -> 1L),
      2L -> Map(bucket("a") -> 1L, bucket("c") -> 1L))
    val byDoc = got.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(byDoc == expected)
    // token mass is conserved per doc (collisions only merge buckets)
    assert(byDoc(1L).values.sum == 3L && byDoc(2L).values.sum == 2L)
  }

  test("hashedEmbedding matches the per-(token, dim) sign sum; empty docs emit nothing") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = TfIdf.hashedEmbedding(docs, "doc_id", "text", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def sign(t: String, j: Int) =
      if ((graft.functions.StableHash.md5Hash60(s"$t:$j") & 1L) == 1L) 1L else -1L
    (0 until 8).foreach { j =>
      assert(got(1L)(j) == 2 * sign("x", j) + sign("y", j))
      assert(got(3L)(j) == sign("x", j))
    }
    assert(!got.contains(2L)) // tokenless doc: no vector
    // identical text => identical vector (the dedup utility)
    val dup = TfIdf.hashedEmbedding(
      Seq((7L, "x x y")).toDF("doc_id", "text"), "doc_id", "text", dim = 8)
      .collect()(0).getSeq[Long](1)
    assert(dup == got(1L).toSeq)
  }

  test("hashedEmbedding magnitude grows with token count (Rademacher sums, parity bound)") {
    import spark.implicits._
    val doc = Seq((1L, Seq.fill(100)("w").mkString(" "))).toDF("doc_id", "text")
    val v = TfIdf.hashedEmbedding(doc, "doc_id", "text", dim = 4)
      .collect()(0).getSeq[Long](1)
    // one repeated token: every dim is exactly ±100
    assert(v.forall(x => math.abs(x) == 100L))
  }
}
