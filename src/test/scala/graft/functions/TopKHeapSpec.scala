package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKHeapSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def randCase(): (Int, List[(Double, Long)]) = {
    val k = 1 + rnd.nextInt(20)
    val n = rnd.nextInt(200)
    // small id/dist domains force plenty of exact ties
    (k, List.fill(n)((rnd.nextInt(20).toDouble / 2.0, rnd.nextInt(50).toLong)))
  }

  private def expected(k: Int, ps: Seq[(Double, Long)]): Seq[(Double, Long)] =
    ps.sortBy(identity).take(k)

  test("heap keeps the k smallest (dist,id) pairs in sorted order") {
    (0 until 300).foreach { _ =>
      val (k, ps) = randCase()
      val h = new TopKHeap(k)
      ps.foreach { case (d, id) => h.insert(d, id) }
      assert(h.sortedPairs.toSeq == expected(k, ps))
    }
  }

  test("merge of split streams equals single-stream result (partial agg correctness)") {
    (0 until 300).foreach { _ =>
      val (k, ps) = randCase()
      val cut = if (ps.isEmpty) 0 else rnd.nextInt(ps.size + 1)
      val (l, r) = ps.splitAt(cut)
      val hl = new TopKHeap(k); l.foreach { case (d, id) => hl.insert(d, id) }
      val hr = new TopKHeap(k); r.foreach { case (d, id) => hr.insert(d, id) }
      assert(hl.merge(hr).sortedPairs.toSeq == expected(k, ps))
    }
  }

  test("duplicate distances break ties by id (deterministic ground truth)") {
    val h = new TopKHeap(3)
    Seq((1.0, 5L), (1.0, 2L), (1.0, 9L), (1.0, 1L)).foreach { case (d, id) => h.insert(d, id) }
    assert(h.sortedPairs.toSeq == Seq((1.0, 1L), (1.0, 2L), (1.0, 5L)))
  }

  test("serialization round trip via TopKPairs") {
    val agg = TopKPairs(null, null, 5)
    val h = new TopKHeap(5)
    Seq((3.0, 1L), (1.0, 2L), (2.0, 3L)).foreach { case (d, id) => h.insert(d, id) }
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedPairs.toSeq == h.sortedPairs.toSeq)
  }
}
