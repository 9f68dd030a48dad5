package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{HashMode, StableHash}

/** Round-15 optimization differential specs: every rewrite that changed an
  * operator's internals is pinned EQUAL to the shape it replaced, on the
  * same inputs.
  *
  *  - BPE driver-side merge loop == the distributed loop (merge table AND
  *    final segmentation), including a tie that exercises the UTF-8
  *    byte-order tie-break;
  *  - minhashPairsFromIndex == minhashLshPairs (the Release.artifacts
  *    one-scan derivation);
  *  - containmentFromIndex == containmentScores;
  *  - md5Window60 == per-window md5Hash60 (incl. a lone-surrogate case,
  *    where Java's UTF-8 encoder substitutes '?');
  *  - hashedEmbedding's per-task memo kernel == the definitionally
  *    unmemoized per-token hash.
  */
class OptimizationEquivalenceSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0L until 120L).map { i =>
      val toks = (0 until 12).map(j => words(((i * 7 + j * 3 + j * j) % 10).toInt))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("BPE driver merge loop == distributed merge loop (merges + vocab)") {
    val wc = Bpe.wordCounts(docsDf, "text")
    val (mDriver, vDriver) =
      Bpe.trainFromCountsWithThreshold(wc, numMerges = 12,
        driverThreshold = Long.MaxValue)
    val (mDist, vDist) =
      Bpe.trainFromCountsWithThreshold(wc, numMerges = 12, driverThreshold = 0L)
    assert(mDriver == mDist,
      s"merge tables differ:\n driver=$mDriver\n dist  =$mDist")
    val dRows = vDriver.select("word", "cnt", "syms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
      .sortBy(_._1)
    val sRows = vDist.select("word", "cnt", "syms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
      .sortBy(_._1)
    assert(dRows.toSeq == sRows.toSeq)
  }

  test("BPE tie-break matches Spark's binary string order on ties") {
    import spark.implicits._
    // two words, same count, so the first merge is a pure tie on cnt:
    // pairs ("a","b") from "ab" and ("a","ß") from "aß" both occur once.
    // Spark's orderBy on StringType is UTF-8 byte order: "b" (0x62) < "ß"
    // (0xC3 0x9F), so ("a","b") must win in BOTH paths.
    val wc = Seq(("ab", 1L), ("aß", 1L)).toDF("word", "cnt")
    val (mDriver, _) = Bpe.trainFromCountsWithThreshold(wc, 1, Long.MaxValue)
    val (mDist, _) = Bpe.trainFromCountsWithThreshold(wc, 1, 0L)
    assert(mDriver == mDist)
    assert(mDriver.head == ((1, "a", "b", 1L)))
  }

  test("minhashPairsFromIndex == minhashLshPairs on the same corpus") {
    val docs = docsDf
    val direct = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numPerms = 32, bands = 8, threshold = 0.3)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val index = Dedup.minhashIndex(docs, "doc_id", "text",
      n = 3, numPerms = 32).localCheckpoint()
    val derived = Dedup.minhashPairsFromIndex(index, numPerms = 32,
        bands = 8, threshold = 0.3)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(direct.nonEmpty, "fixture produced no pairs — weak test")
    assert(direct.toSeq == derived.toSeq)
  }

  test("containmentFromIndex == containmentScores on the same corpus") {
    val docs = docsDf
    val bench = docs.filter(col("doc_id") % 25 === 0)
    val direct = Dedup.containmentScores(docs, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val index = Dedup.minhashIndex(docs, "doc_id", "text",
      n = 3, numPerms = 16).localCheckpoint()
    val derived = Dedup.containmentFromIndex(docs.select(col("doc_id")), index,
        bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(direct.toSeq == derived.toSeq)
  }

  test("md5Window60 == per-window md5Hash60 (ascii, multibyte, surrogate)") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld ß€中文 mixed",
      // lone high surrogate: new String(...).getBytes("UTF-8") encodes '?'
      "abc" + '\uD800' + "def",
      "😀 full pair emoji tail")
    for (s <- cases; l <- Seq(1, 3, 7)) {
      val cps = s.codePoints().toArray
      val fast = StableHash.md5Window60(cps, l)
      val slow = if (cps.length - l + 1 <= 0) Array.emptyLongArray
        else Array.tabulate(cps.length - l + 1)(i =>
          StableHash.md5Hash60(new String(cps, i, l)))
      assert(fast.toSeq == slow.toSeq, s"mismatch for '$s' l=$l")
    }
  }

  test("hashedEmbedding memoized kernel == direct per-token hashing") {
    import spark.implicits._
    val docs = docsDf
    val fast = TfIdf.hashedEmbedding(docs, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    // definitional recomputation, no memo
    val slow = docs.as[(Long, String)].collect().flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val v = new Array[Long](8)
        toks.foreach { t =>
          var j = 0
          while (j < 8) {
            v(j) += (if ((HashMode.Md5.hash60(t + ":" + j) & 1L) == 1L) 1L else -1L)
            j += 1
          }
        }
        Some((id, v.toSeq))
      }
    }.sortBy(_._1)
    assert(fast.map { case (i, v) => (i, v.toSeq) }.toSeq == slow.toSeq)
  }
}
