package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence-packing invariants: the distributed two-phase prefix sum equals
  * the sequential definition, is partition-count independent, and the
  * exploded manifest tiles every sequence exactly and covers every document
  * contiguously.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16
  private val counts = Seq((1L, 5L), (2L, 20L), (3L, 0L), (4L, 7L),
    (5L, 16L), (6L, 1L), (7L, 40L))
  private def docs = counts.toDF("doc_id", "n_tok")
  private val kept = counts.filter(_._2 > 0)
  private val totalTokens = kept.map(_._2).sum

  test("coordinates equal the sequential definition (zero-token docs excluded)") {
    val got = Packing.packCoordinates(docs, "doc_id", "n_tok", L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    var start = 0L
    val expected = kept.map { case (id, n) =>
      val row = (id, n, start, start / L, (start + n - 1) / L, start % L)
      start += n
      row
    }
    assert(got == expected)
  }

  test("coordinates are independent of the partition count") {
    val one = Packing.packCoordinates(docs, "doc_id", "n_tok", L, numParts = 1)
      .orderBy("doc_id").collect().toSeq
    val many = Packing.packCoordinates(docs, "doc_id", "n_tok", L, numParts = 7)
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }

  test("manifest tiles every sequence exactly") {
    val rows = Packing.packManifest(docs, "doc_id", "n_tok", L).collect()
    val lastSeq = (totalTokens - 1) / L
    val bySeq = rows.groupBy(_.getLong(1))
    assert(bySeq.keySet == (0L to lastSeq).toSet)
    for ((seq, slices) <- bySeq) {
      val ordered = slices.map(r => (r.getLong(4), r.getLong(3) - r.getLong(2)))
        .sortBy(_._1)
      var pos = 0L
      for ((off, len) <- ordered) {
        assert(off == pos, s"seq $seq: slice at offset $off, expected $pos")
        assert(len > 0)
        pos += len
      }
      val want = if (seq == lastSeq) totalTokens - seq * L else L.toLong
      assert(pos == want, s"seq $seq holds $pos tokens, expected $want")
    }
  }

  test("manifest slices cover each document contiguously from token 0") {
    val rows = Packing.packManifest(docs, "doc_id", "n_tok", L).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == kept.map(_._1).toSet)
    for ((id, slices) <- byDoc) {
      val ordered = slices.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(ordered.head._2 == 0L, s"doc $id first slice starts at token 0")
      ordered.sliding(2).foreach {
        case Array((s1, _, e1), (s2, st2, _)) =>
          assert(s2 == s1 + 1 && st2 == e1, s"doc $id slices not contiguous")
        case _ =>
      }
      assert(ordered.last._3 == kept.toMap.apply(id), s"doc $id fully covered")
    }
  }

  test("materialized sequences reconstruct the corpus token stream exactly") {
    val textDocs = Seq((1L, "a b c"), (2L, "d e f g h"), (3L, ""), (4L, "i j"))
      .toDF("doc_id", "text")
    val rows = Packing.materializeSequences(textDocs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
    // stream = a b c | d e f g h | i j → seqs: "a b c d", "e f g h", "i j"
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 4L), (1L, 4L), (2L, 2L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("a b c d", "e f g h", "i j").map(md5hex))
  }

  test("a doc straddling many sequences materializes each slice exactly once") {
    // one 23-token doc at seqLen 4 straddles 7 sequences (the shape whose
    // slices must come from ONE join row, not 7 copies of the token array),
    // flanked by docs that shift it off a sequence boundary
    val big = (0 until 23).map(i => s"w$i").mkString(" ")
    val textDocs = Seq((1L, "p q"), (2L, big), (3L, "x y z"))
      .toDF("doc_id", "text")
    val rows = Packing.materializeSequences(textDocs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
    val stream = ("p q " + big + " x y z").split(" ")
    val expected = stream.grouped(4).map(_.mkString(" ")).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    // 2 + 23 + 3 = 28 tokens → exactly 7 full sequences
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 7L).map(i => (i, 4L)))
    assert(rows.map(_.getString(2)).toSeq == expected.map(md5hex))
  }

  test("seqLen must be positive") {
    intercept[IllegalArgumentException] {
      Packing.packCoordinates(docs, "doc_id", "n_tok", 0)
    }
  }

  test("lengthBatches: length order, atomic docs, bounded batch totals") {
    val B = 16
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 3L), (4L, 9L), (5L, 14L),
      (6L, 1L), (7L, 0L), (8L, 5L), (9L, 2L))
    val got = Packing.lengthBatches(rows.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", budget = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential replay of the documented rule
    val kept = rows.filter(_._2 > 0).sortBy { case (id, n) => (n, id) }
    var s = 0L
    val want = kept.map { case (id, n) =>
      val b = s / B; s += n; (id, n, b)
    }.toSet
    assert(got.toSet == want)
    assert(!got.exists(_._1 == 7L)) // zero-token docs excluded
    // bound: each batch's total < budget + its own max doc length
    got.groupBy(_._3).values.foreach { batch =>
      assert(batch.map(_._2).sum < B + batch.map(_._2).max)
    }
    // ids outside [0, 2^31) fail loudly, not silently corrupt the key
    val bad = Seq((Long.MaxValue, 5L)).toDF("doc_id", "n_tok")
    intercept[Exception] {
      Packing.lengthBatches(bad, "doc_id", "n_tok", budget = B).collect()
    }
  }

  test("packReport summarizes fill rate, padding and boundary straddles") {
    // kept docs: 5,20,7,16,1,40 tokens (89 total) at L=16 -> 6 sequences
    val r = Packing.packReport(docs, "doc_id", "n_tok", seqLen = L).head()
    assert(r.getAs[Long]("seq_len") == L)
    assert(r.getAs[Long]("total_tokens") == totalTokens)
    assert(r.getAs[Long]("n_sequences") == (totalTokens + L - 1) / L)
    assert(r.getAs[Long]("pad_tokens") ==
      (totalTokens + L - 1) / L * L - totalTokens)
    assert(r.getAs[Double]("fill_rate") ==
      math.rint(totalTokens.toDouble / ((totalTokens + L - 1) / L * L) * 1e6) / 1e6)
    assert(r.getAs[Long]("n_docs") == kept.size)
    // sequential replay of which docs straddle a boundary
    var off = 0L
    var straddles = 0L
    kept.foreach { case (_, n) =>
      if (off / L != (off + n - 1) / L) straddles += 1
      off += n
    }
    assert(r.getAs[Long]("n_split_docs") == straddles)
  }

  test("packReport on a zero-token corpus is total (fill_rate 0.0, no nulls)") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tok")
    for (d <- Seq(empty, Seq((1L, 0L)).toDF("doc_id", "n_tok"))) {
      val r = Packing.packReport(d, "doc_id", "n_tok", seqLen = L).head()
      assert(r.getAs[Long]("n_sequences") == 0L)
      assert(r.getAs[Long]("total_tokens") == 0L)
      assert(!r.isNullAt(r.fieldIndex("fill_rate")) &&
        r.getAs[Double]("fill_rate") == 0.0)
      assert(r.getAs[Long]("pad_tokens") == 0L)
    }
  }

  test("materializeTokenSequences over pre-tokenized arrays == text path") {
    val textDocs = Seq((1L, "a b c"), (2L, "d e f g h"), (3L, ""), (4L, "i j"))
      .toDF("doc_id", "text")
    val pretok = textDocs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    val viaText = Packing.materializeSequences(textDocs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaToks = Packing.materializeTokenSequences(pretok, "doc_id", "tk", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaText == viaToks)
  }

  test("per-group coordinates: contiguous group-local streams, matching the global form per group") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (s"g${i % 3}", i, (i % 5) + 1))
      .toDF("g", "id", "n")
    val grouped = Packing.packCoordinatesPerGroup(rows, "g", "id", "n", seqLen = 16)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    grouped.groupBy(_._1).foreach { case (g, rs) =>
      // group-local contiguity: each doc starts where the previous ended
      val sorted = rs.sortBy(_._2)
      sorted.foldLeft(0L) { case (expect, (_, id, n, start)) =>
        assert(start == expect, s"group $g doc $id starts at $start, expected $expect")
        expect + n
      }
      // parity with the GLOBAL packer run on this group alone
      val solo = Packing.packCoordinates(
        rows.filter(col("g") === g).select("id", "n"), "id", "n", seqLen = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      sorted.foreach { case (_, id, _, start) => assert(solo(id) == start) }
    }
  }

  test("nextFitDecreasing: capacity respected, offsets contiguous, >= LP bound, oversized fails loudly") {
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 7L), ("a", 3L, 7L), ("a", 4L, 4L), ("a", 5L, 2L),
      ("b", 6L, 16L), ("b", 7L, 1L)).toDF("g", "id", "n")
    val packed = Packing.nextFitDecreasing(rows, "g", "id", "n", seqLen = 16L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // every bin holds <= capacity; offsets are the contiguous prefix sums
    packed.groupBy(p => (p._1, p._4)).foreach { case ((_, _), docs) =>
      val inOrder = docs.sortBy(_._5)
      assert(inOrder.map(_._3).sum <= 16L)
      var expect = 0L
      inOrder.foreach { d => assert(d._5 == expect); expect += d._3 }
    }
    // group a: 30 tokens -> LP bound 2 bins; NFD desc = 10,7,7,4,2:
    // bin0 = 10+7(17>16? 10+7=17 -> no: 10, then 7 fits 10+7=17 > 16 opens bin1)
    val aBins = packed.filter(_._1 == "a").map(_._4).max + 1
    assert(aBins >= 2 && aBins <= 3)
    // group b independent: 16-token doc exactly fills bin 0; the 1-token doc opens bin 1
    val b = packed.filter(_._1 == "b").sortBy(_._2)
    assert(b.map(x => (x._2, x._4, x._5)).toSeq == Seq((6L, 0L, 0L), (7L, 1L, 0L)))
    // the report card agrees with the raw packing and never beats LP
    val card = Packing.binPackReport(
      Packing.nextFitDecreasing(rows, "g", "id", "n", 16L), "g", 16L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    card.foreach { case (_, (bins, lp)) => assert(bins >= lp) }
    // oversized doc fails loudly
    val ex = intercept[org.apache.spark.SparkException] {
      Packing.nextFitDecreasing(
        Seq(("a", 1L, 99L)).toDF("g", "id", "n"), "g", "id", "n", 16L).collect()
    }
    assert(ex.getMessage != null)
  }
}
