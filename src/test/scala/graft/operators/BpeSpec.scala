package graft.operators

import graft.SparkSpec

/** BPE training must equal a sequential reference (same init, tie and
  * greedy-merge rules) over many merges, apply merges greedily
  * left-to-right, stop early when no pair remains, and encode with the
  * final segmentation.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE over a word-count map. */
  private def refTrain(words: Map[String, Long], numMerges: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Array[String]]) = {
    var segs: Map[String, Array[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toArray }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        val s = segs(w)
        (0 until s.length - 1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, c))
        segs = segs.map { case (w, s) => w -> Bpe.applyMerge(s, l, r) }
        rank += 1
      }
    }
    (merges.toSeq, segs)
  }

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "newest newest newest newest"),
    (4L, "widest widest widest"),
    (5L, "new new newer wider low"))
  private def docs = corpus.toDF("doc_id", "text").repartition(3)

  test("30-merge training equals the sequential reference") {
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (want, _) = refTrain(words, 30)
    val got = Bpe.train(docs, "text", numMerges = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("applyMerge is greedy left-to-right (aaa -> [aa, a])") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("x", "a", "a"), "a", "a").toSeq == Seq("x", "aa"))
    assert(Bpe.applyMerge(Array("a", "b"), "b", "a").toSeq == Seq("a", "b"))
  }

  test("training stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = Bpe.train(tiny, "text", numMerges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "b", 2L))) // one merge, then exhausted
  }

  test("fit: vocabulary = alphabet ∪ merge outputs, ids in UTF-8 byte order") {
    val model = Bpe.fit(docs, "text", numMerges = 3)
    assert(model.merges.length == 3)
    val alphabet = corpus.flatMap(_._2.split(" ")).flatMap(_.map(_.toString)).toSet
    val expectPieces = alphabet ++ model.merges.map { case (l, r) => l + r }
    assert(model.vocab.keySet == expectPieces)
    // ids are the rank in byte order, contiguous from 0
    val byId = model.vocab.toSeq.sortBy(_._2)
    assert(byId.map(_._2) == byId.indices)
    assert(byId.map(_._1) == byId.map(_._1).sorted) // ASCII fixture: byte order = natural
  }

  test("encode replays the trained segmentation: ids decode to refTrain pieces") {
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (_, segs) = refTrain(words, 10)
    val model = Bpe.fit(docs, "text", numMerges = 10)
    val inv = model.vocab.map(_.swap)
    val got = Bpe.encode(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).map(inv)).toMap
    val want = corpus.map { case (id, t) =>
      id -> t.split(" ").flatMap(w => segs(w)).toSeq
    }.toMap
    assert(got == want)
  }

  test("segmentWord lowest-rank-first equals sequential merge replay (randomized)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      // train on a random corpus so the merge table has the trained-rank
      // structure the lowest-rank-first equivalence relies on
      val ws = (0 until 12).map(_ =>
        (0 until (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val wc = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val (merges, _) = refTrain(wc, 8)
      val rank = merges.map { case (rk, l, r, _) => (l, r) -> rk.toInt }.toMap
      // sequential replay: apply each merge in rank order
      ws.distinct.foreach { w =>
        var seq: Array[String] = w.map(_.toString).toArray
        merges.sortBy(_._1).foreach { case (_, l, r, _) =>
          seq = Bpe.applyMerge(seq, l, r)
        }
        val fast = Bpe.segmentWord(w, rank)
        assert(fast.toSeq == seq.toSeq, s"trial $trial word '$w'")
      }
    }
  }

  test("encode maps pieces outside the training vocabulary to -1 (UNK)") {
    val model = Bpe.fit(docs, "text", numMerges = 2)
    val unseen = Seq((9L, "low zzq")).toDF("doc_id", "text")
    val ids = Bpe.encode(unseen, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // 'z' and 'q' never appear in the training corpus
    assert(ids(9L).count(_ == -1) == 3)
    assert(ids(9L).forall(i => i == -1 || i >= 0))
  }

  test("decode inverts encode to the space-stripped corpus; UNK ids yield U+FFFD") {
    val model = Bpe.fit(docs, "text", numMerges = 10)
    val roundTrip = Bpe.decode(
        Bpe.encode(docs, "doc_id", "text", model), "doc_id", "tok_ids", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = corpus.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).mkString("")
    }.toMap
    assert(roundTrip == want)
    // out-of-vocabulary ids decode to the replacement character
    val bad = Seq((1L, Array(0, -1, model.vocab.size))).toDF("doc_id", "tok_ids")
    val got = Bpe.decode(bad, "doc_id", "tok_ids", model)
      .collect().head.getString(1)
    assert(got.count(_ == '�') == 2)
  }

  test("encodeCounts equals the reference segmentation's piece totals") {
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (_, segs) = refTrain(words, 10)
    val want = corpus.map { case (id, t) =>
      id -> t.split(" ").map(w => segs(w).length.toLong).sum
    }.toMap
    val got = Bpe.encodeCounts(docs, "doc_id", "text", numMerges = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  // ---- byte level --------------------------------------------------------

  private val byteCorpus = Seq(
    (1L, "Hello world, hello World!"),          // case differs -> distinct bytes
    (2L, "数据处理引擎 spark 数据处理"),            // multi-byte zh
    (3L, "  leading spaces and émojis: 🙂🙂"),  // supplementary plane + accents
    (4L, "1234 5678 1234 worlds apart"))
  private def byteDocs = byteCorpus.toDF("doc_id", "text").repartition(3)

  test("byteToChar is the GPT-2 bijection: 256 distinct printable chars") {
    val chars = Bpe.byteToChar
    assert(chars.length == 256 && chars.distinct.length == 256)
    assert(chars('A'.toInt) == 'A' && chars('!'.toInt) == '!')
    // the 68 non-printable bytes map above U+00FF in ascending byte order
    val remapped = (0 until 256).filter(b => chars(b) >= 256)
    assert(remapped.size == 68)
    assert(remapped.map(chars(_).toInt) == remapped.indices.map(256 + _))
    assert(Bpe.charToByte.size == 256)
  }

  test("pretokens tile the text exactly (concatenation identity)") {
    byteCorpus.foreach { case (_, t) =>
      assert(Bpe.pretokenize(t).mkString == t, s"text='$t'")
    }
    assert(Bpe.pretokenize("").isEmpty)
  }

  test("byte-level 25-merge training equals the sequential reference") {
    val words = byteCorpus.flatMap { case (_, t) =>
      Bpe.pretokenize(t).map(Bpe.mapBytes)
    }.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val (want, _) = refTrain(words, 25)
    val got = Bpe.trainBytes(byteDocs, "text", numMerges = 25)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == want)
  }

  test("fitBytes: full 256-byte base vocab, encode never emits -1") {
    val model = Bpe.fitBytes(byteDocs, "text", numMerges = 10)
    assert(model.vocab.size == 256 + model.merges.map { case (l, r) => l + r }
      .distinct.size)
    val ids = Bpe.encodeBytes(byteDocs, "doc_id", "text", model)
      .collect().flatMap(r => r.getSeq[Int](r.fieldIndex("tok_ids")))
    assert(ids.nonEmpty && ids.forall(_ >= 0))
    // unseen input (new chars, new script) still encodes via byte fallback
    val unseen = Seq((9L, "Ω never-seen-at-train-time ληξ"))
      .toDF("doc_id", "text")
    val u = Bpe.encodeBytes(unseen, "doc_id", "text", model)
      .collect()(0) match { case r => r.getSeq[Int](r.fieldIndex("tok_ids")) }
    assert(u.nonEmpty && u.forall(_ >= 0))
  }

  test("decodeBytes inverts encodeBytes EXACTLY (case, spaces, multi-byte)") {
    val model = Bpe.fitBytes(byteDocs, "text", numMerges = 12)
    val enc = Bpe.encodeBytes(byteDocs, "doc_id", "text", model)
    val got = Bpe.decodeBytes(enc, "doc_id", "tok_ids", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    byteCorpus.foreach { case (id, t) => assert(got(id) == t, s"doc $id") }
  }
}
