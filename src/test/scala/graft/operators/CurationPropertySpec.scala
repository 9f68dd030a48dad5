package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.StableHash

/** Randomized (seeded, deterministic) property coverage for the curation
  * family: packing invariants over random corpora and sequence lengths,
  * JVM↔SQL hash parity for the engine-neutral md5-60 hash, and mixture
  * epoch-count bounds under random factors.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  test("packing invariants hold over random corpora and seqLens") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val n = 1 + rnd.nextInt(80)
      val counts = (0 until n).map(i => (i.toLong * 3 + 1, rnd.nextInt(51).toLong))
      val seqLen = 1 + rnd.nextInt(64)
      val kept = counts.filter(_._2 > 0)
      val total = kept.map(_._2).sum

      val coords = Packing.packCoordinates(
        counts.toDF("id", "n"), "id", "n", seqLen)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))

      // sequential model
      var start = 0L
      val model = kept.map { case (id, k) =>
        val row = (id, k, start, start / seqLen, (start + k - 1) / seqLen,
          start % seqLen)
        start += k
        row
      }
      assert(coords.toSeq == model, s"trial $trial (n=$n, L=$seqLen)")

      if (total > 0) {
        val manifest = Packing.packManifest(
          counts.toDF("id", "n"), "id", "n", seqLen).collect()
        // the slices of every sequence tile [0, len) exactly
        val lastSeq = (total - 1) / seqLen
        val bySeq = manifest.groupBy(_.getLong(1))
        assert(bySeq.keySet == (0L to lastSeq).toSet, s"trial $trial")
        for ((seq, rows) <- bySeq) {
          val covered = rows.map(r => (r.getLong(4), r.getLong(3) - r.getLong(2)))
            .sortBy(_._1)
          var pos = 0L
          covered.foreach { case (off, len) => assert(off == pos); pos += len }
          val want = if (seq == lastSeq) total - seq * seqLen else seqLen.toLong
          assert(pos == want, s"trial $trial seq $seq")
        }
        // slice lengths per doc sum to the doc's token count
        val perDoc = manifest.groupBy(_.getLong(0))
          .map { case (id, rows) => id -> rows.map(r => r.getLong(3) - r.getLong(2)).sum }
        assert(perDoc == kept.toMap, s"trial $trial")
      }
    }
  }

  test("JVM md5Hash60 kernel equals the SQL conv(substr(md5)) form") {
    val rnd = new scala.util.Random(7)
    val strings = (0 until 200).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val viaSql = strings.toDF("i", "s")
      .select(col("i"), conv(substring(md5(col("s")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    strings.foreach { case (i, s) =>
      assert(StableHash.md5Hash60(s) == viaSql(i), s"string #$i '$s'")
    }
  }

  test("as-of join equals a brute-force per-row recompute on random data") {
    val rnd = new scala.util.Random(99)
    val left = (0 until 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
    val right = (0 until 500).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong,
        (rnd.nextInt(1000) / 10.0)))
    val got = AsofJoin.asof(left.toDF("k", "t", "lid"),
        right.toDF("k", "t", "rid", "v"), "k", "t", "rid", Seq("v"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val expected = left.map { case (k, t, lid) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2, r._3))._4))
    }.toMap
    assert(got == expected)
  }

  test("bm25 equals an independent in-test recompute on a random corpus") {
    val rnd = new scala.util.Random(5)
    val docs = (0 until 120).map { i =>
      val len = 5 + rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => s"t${rnd.nextInt(30)}").mkString(" "))
    }
    val terms = Seq("t3", "t7", "t11")
    val k1 = 1.2; val b = 0.75
    val tokLists = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val nDocs = docs.size.toDouble
    val avgLen = tokLists.map(_._2.size.toDouble).sum / nDocs
    val dfreq = terms.map(t => t -> tokLists.count(_._2.contains(t)).toDouble).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = tokLists.flatMap { case (id, toks) =>
      val len = toks.size.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || dfreq(t) == 0) 0.0
        else math.log((nDocs - dfreq(t) + 0.5) / (dfreq(t) + 0.5) + 1.0) * tf *
          (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * len / avgLen))
      }.sum
      if (s > 0) Some(id -> r6(s)) else None
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = Bm25.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == expected)
  }

  test("mixture epoch counts stay in {floor(f), floor(f)+1} for random factors") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 4) {
      val f = rnd.nextDouble() * 3.0
      val out = Mixture.materialize(
        (0L until 200L).map(i => (i, "d")).toDF("id", "domain"),
        "domain", "id", Map("d" -> f))
      val perKey = out.groupBy("id").count().collect().map(_.getLong(1))
      val lo = math.floor(f).toLong
      assert(perKey.forall(c => c == lo || c == lo + 1), s"trial $trial f=$f")
      val expectedRows = out.count()
      // total volume within binomial range of 200*f
      assert(math.abs(expectedRows - 200.0 * f) < 50, s"trial $trial f=$f")
    }
  }
}
