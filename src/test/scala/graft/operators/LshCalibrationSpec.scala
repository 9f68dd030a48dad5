package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSH S-curve calibration card: mid-similarity behavior on a corpus with
  * CONTROLLED pair similarity (shared-prefix construction), agreement of
  * empirical detection with the analytic curve, and the config ordering
  * the card exists to expose (more rows per band = steeper curve = lower
  * detection below the knee).
  */
class LshCalibrationSpec extends SparkSpec {
  import spark.implicits._

  // doc 2i and 2i+1 share the first `keep` of 40 words, diverge after —
  // a ladder of pair similarities across the buckets
  private def ladder: org.apache.spark.sql.DataFrame = {
    val rows = (0 until 40).flatMap { i =>
      val keep = 4 + (i % 9) * 4 // 4..36 shared words
      val a = (0 until 40).map(w => s"w${i}_$w")
      val b = a.take(keep) ++ (0 until (40 - keep)).map(w => s"x${i}_$w")
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, b.mkString(" ")))
    }
    rows.toDF("doc_id", "text")
  }

  test("empirical detection tracks the analytic S-curve and config steepness orders") {
    val card = Dedup.lshCalibrationCard(ladder, "doc_id", "text", n = 3,
        numPerms = 24, configs = Seq((8, 3), (4, 6)), nBuckets = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(3)) ->
        (r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap

    // ladder pairs populate multiple buckets (construction guarantees
    // mid-similarity mass — the regime the card exists for)
    val buckets83 = card.keys.filter(_._1 == "b=8,r=3").map(_._2).toSet
    assert(buckets83.size >= 3, s"ladder must spread buckets: $buckets83")

    card.foreach { case ((cfg, bucket), (n, emp, theory)) =>
      // empirical ≈ theory: binomial noise bound, loose 3-sigma + slack
      val sigma = math.sqrt(math.max(theory * (1 - theory), 1e-4) / n)
      assert(math.abs(emp - theory) <= 3 * sigma + 0.15,
        s"$cfg bucket $bucket: emp=$emp theory=$theory n=$n")
    }

    // detected_frac nondecreasing in bucket per config (S-curve shape)
    Seq("b=8,r=3", "b=4,r=6").foreach { cfg =>
      val curve = card.collect { case ((c, b), (_, e, _)) if c == cfg => (b, e) }
        .toSeq.sortBy(_._1).map(_._2)
      assert(curve == curve.sorted, s"$cfg not monotone: $curve")
    }

    // steeper config (r=6) detects NO MORE than the shallow one (r=3)
    // below the knee at equal hash budget (b*r = 24 both)
    card.keys.map(_._2).toSet.toSeq.sorted.takeWhile(_ <= 2).foreach { b =>
      (card.get(("b=8,r=3", b)), card.get(("b=4,r=6", b))) match {
        case (Some((_, e83, _)), Some((_, e46, _))) =>
          assert(e46 <= e83 + 1e-9, s"bucket $b: r=6 ($e46) > r=3 ($e83)")
        case _ => // bucket absent for one config's pair set — same pairs, can't happen
      }
    }
  }

  test("identical docs detect with probability 1 under every config") {
    val twins = Seq((0L, "a b c d e f g h i j"), (1L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val card = Dedup.lshCalibrationCard(twins, "doc_id", "text", n = 3,
      numPerms = 12, configs = Seq((4, 3), (12, 1)), nBuckets = 5)
    card.collect().foreach { r =>
      assert(r.getLong(3) == 4L && r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
    }
  }

  test("bad configs fail loudly") {
    intercept[IllegalArgumentException] {
      Dedup.lshCalibrationCard(ladder, "doc_id", "text", n = 3,
        numPerms = 8, configs = Seq((3, 3)))
    }
  }
}
