package graft.operators

import graft.SparkSpec

/** Viterbi DP vs exhaustive segmentation enumeration, inventory counting
  * edge cases (1-char words must not double-count), and the
  * all-words-segmentable guarantee.
  */
class UnigramSegSpec extends SparkSpec {
  import spark.implicits._

  test("a single 1-char word yields one piece with score 0 (no double count)") {
    val docs = Seq("a").toDF("text")
    val pieces = UnigramSeg.pieceScores(docs, "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pieces == Map("a" -> 0.0)) // ln(1/1)
    val best = UnigramSeg.wordBestScores(docs, "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(best == Map("a" -> 0.0))
  }

  test("DP equals exhaustive enumeration on a random corpus") {
    val rnd = new scala.util.Random(19)
    val words = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val docs = Seq(words.mkString(" ")).toDF("text")
    val scores = UnigramSeg.pieceScores(docs, "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    def allPaths(w: String): Seq[Double] = {
      def rec(pos: Int, acc: Double): Seq[Double] =
        if (pos == w.length) Seq(acc)
        else (1 to 2).filter(pos + _ <= w.length).flatMap { l =>
          scores.get(w.substring(pos, pos + l)).toSeq
            .flatMap(s => rec(pos + l, acc + s))
        }
      rec(0, 0.0)
    }

    val got = UnigramSeg.wordBestScores(docs, "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == words.toSet)
    words.distinct.foreach { w =>
      val want = math.rint(allPaths(w).max * 1e6) / 1e6
      assert(got(w) == want, s"word=$w")
    }
  }

  test("supplementary-plane code points count as ONE piece unit") {
    // 𝔞 (U+1D51E) is 2 UTF-16 units but 1 code point; pieceScores builds
    // the inventory with code-point substrings, so the DP must too —
    // "𝔞𝔟" has the 2-code-point piece available, and "a𝔞" segments.
    val w1 = new String(Character.toChars(0x1D51E)) // 𝔞
    val w2 = new String(Character.toChars(0x1D51F)) // 𝔟
    val docs = Seq(s"$w1$w2 a$w1").toDF("text")
    val pieces = UnigramSeg.pieceScores(docs, "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pieces.contains(w1 + w2), "2-code-point piece must be in inventory")
    val best = UnigramSeg.wordBestScores(docs, "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exhaustive optimum over code-point segmentations
    def exhaustive(w: String): Double = {
      val cps = w.codePoints().toArray
      def rec(pos: Int, acc: Double): Seq[Double] =
        if (pos == cps.length) Seq(acc)
        else (1 to 2).filter(pos + _ <= cps.length).flatMap { l =>
          pieces.get(new String(cps, pos, l)).toSeq
            .flatMap(s => rec(pos + l, acc + s))
        }
      math.rint(rec(0, 0.0).max * 1e6) / 1e6
    }
    Seq(w1 + w2, "a" + w1).foreach { w =>
      assert(best(w) == exhaustive(w), s"word=$w")
      assert(!best(w).isNegInfinity)
    }
  }

  test("every vocabulary word is segmentable (finite score)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val best = UnigramSeg.wordBestScores(docs, "text").collect()
    assert(best.nonEmpty)
    assert(best.forall(r => !r.getDouble(1).isNegInfinity))
  }

  test("hard-EM concentrates mass on the winning bigram and prunes the rest") {
    import spark.implicits._
    // vocabulary {abab ×3}: the 'ab'-piece path dominates every 1-char
    // path, so one iteration keeps ab (count 2 per word × 3) and drops
    // a, b, ba entirely
    val docs = Seq((1L, "abab abab"), (2L, "abab")).toDF("doc_id", "text")
    val got = UnigramSeg.hardEmIteration(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 6L))
  }

  test("an EXACT quantized-score tie breaks to the shorter-piece path (the stated rule)") {
    import spark.implicits._
    // pieces: a(2), aa(1), b(1), total 4 -> s(a)=round6(ln .5),
    // s(aa)=round6(ln .25) = exactly 2*s(a) in doubles: the 'aa' word's
    // two paths TIE, and lenpath '11' < '2' must win -> aa never counted
    val docs = Seq((1L, "aa b")).toDF("doc_id", "text")
    val got = UnigramSeg.hardEmIteration(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L), s"tie rule violated: $got")
  }

  test("iterated hard-EM: Viterbi objective non-decreasing, inventory only shrinks") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val wc = graft.operators.Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def objective(scores: Map[String, Double]): Double = wc.map { case (w, cnt) =>
      val cps = w.codePoints().toArray
      val best = Array.fill(cps.length + 1)(Double.NegativeInfinity)
      best(0) = 0.0
      for (i <- 1 to cps.length; l <- 1 to math.min(2, i))
        scores.get(new String(cps, i - l, l)).foreach { s =>
          best(i) = math.max(best(i), best(i - l) + s)
        }
      cnt * best(cps.length)
    }.sum
    val iterScores = (1 to 3).map { it =>
      UnigramSeg.hardEm(docs, "text", iters = it)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    }
    // inventory monotone shrinking
    assert(iterScores(0).keySet.subsetOf(
      UnigramSeg.pieceScores(docs, "text").select("piece")
        .collect().map(_.getString(0)).toSet))
    assert(iterScores(1).keySet.subsetOf(iterScores(0).keySet))
    assert(iterScores(2).keySet.subsetOf(iterScores(1).keySet))
    // objective non-decreasing across the re-estimations
    val o1 = objective(iterScores(0)); val o2 = objective(iterScores(1))
    val o3 = objective(iterScores(2))
    assert(o2 >= o1 - 1e-6 && o3 >= o2 - 1e-6, s"objective fell: $o1 -> $o2 -> $o3")
  }

  test("hard-EM with pieces of length >= 10 conserves characters (path decode)") {
    import spark.implicits._
    // a 12-char word with maxPieceLen = 12 puts length-10+ pieces in the
    // inventory; the old digit-string path encoding decoded "12" as pieces
    // of length 1 and 2, breaking character conservation
    val docs = Seq(
      "abcdefghijkl abcdefghijkl abcdefghijkl xy xy",
      "abcdefghijkl qq").toDF("text")
    val wc = graft.operators.Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val wantChars = wc.map { case (w, c) => w.codePointCount(0, w.length) * c }.sum
    val out = UnigramSeg.hardEmIteration(docs, "text", maxPieceLen = 12)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gotChars = out.map { case (p, c) => p.codePointCount(0, p.length) * c }.sum
    assert(gotChars == wantChars,
      s"E-step pieces cover $gotChars chars, corpus has $wantChars")
    // the dominant 12-char word must be segmentable into real substrings
    out.foreach { case (p, _) =>
      assert("abcdefghijkl xy qq".contains(p) || p.forall(_.isLetter)) }
  }

  test("hard-EM output is a normalized distribution over surviving pieces") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = UnigramSeg.hardEmIteration(docs, "text").collect()
    assert(rows.nonEmpty)
    val z = rows.map(r => math.exp(r.getDouble(2))).sum
    assert(math.abs(z - 1.0) < 1e-3, s"sum exp(new_score) = $z")
  }
}
