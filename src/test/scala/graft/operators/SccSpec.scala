package graft.operators

import scala.collection.mutable

import graft.SparkSpec

/** SCC contracts vs an in-test Tarjan reference: exact partition equality
  * on seeded random digraphs, multi-wave peeling on a chain of cycles,
  * trim-only resolution of DAGs, and the loud wave guard.
  */
class SccSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential Tarjan; components keyed by their min id. */
  private def tarjan(nodes: Seq[Long], adj: Map[Long, Seq[Long]]): Map[Long, Long] = {
    val index = mutable.Map[Long, Int]()
    val low = mutable.Map[Long, Int]()
    val onStack = mutable.Set[Long]()
    val stack = mutable.Stack[Long]()
    val comp = mutable.Map[Long, Long]()
    var counter = 0
    def strongConnect(v: Long): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack += v
      for (w <- adj.getOrElse(v, Nil)) {
        if (!index.contains(w)) { strongConnect(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), index(w))
      }
      if (low(v) == index(v)) {
        val members = mutable.Buffer[Long]()
        var w = -1L
        do { w = stack.pop(); onStack -= w; members += w } while (w != v)
        val m = members.min
        members.foreach(comp(_) = m)
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongConnect(v))
    comp.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.scc(edges.toDF("src", "dst")).as[(Long, Long)].collect().toMap

  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val clean = edges.filter(e => e._1 != e._2).distinct
    val nodes = clean.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    tarjan(nodes, clean.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
  }

  test("seeded random digraph matches Tarjan exactly") {
    // LCG-seeded 60-node digraph, ~150 edges
    var s = 12345L
    def next(): Long = { s = (s * 48271) % 2147483647L; s }
    val edges = (1 to 150).map(_ => (next() % 60, next() % 60))
    assert(run(edges) == reference(edges))
  }

  test("denser random digraph (bigger SCCs) matches Tarjan") {
    var s = 999L
    def next(): Long = { s = (s * 48271) % 2147483647L; s }
    val edges = (1 to 400).map(_ => (next() % 50, next() % 50))
    val got = run(edges)
    assert(got == reference(edges))
    // sanity: the dense graph actually has a non-trivial giant SCC
    assert(got.groupBy(_._2).values.map(_.size).max > 10)
  }

  test("chain of 3-cycles peels one wave per condensation layer") {
    val edges = (0 until 8).flatMap { k =>
      val b = 3L * k
      Seq((b, b + 1), (b + 1, b + 2), (b + 2, b)) ++
        (if (k < 7) Seq((b + 2, b + 3)) else Nil)
    }
    val got = run(edges)
    assert(got == reference(edges))
    (0 until 8).foreach { k =>
      val b = 3L * k
      assert(got(b) == b && got(b + 1) == b && got(b + 2) == b)
    }
  }

  test("DAG resolves to all-singletons (trim only)") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val got = run(edges)
    assert(got == (0L to 4L).map(v => v -> v).toMap)
  }

  test("self-loops and duplicate edges are ignored") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))
    assert(run(noisy) == Map(1L -> 1L, 2L -> 1L))
  }

  test("bow-tie classifies core / in / out / other on a hand graph") {
    // core 2-cycle {5,6}; 1 -> 5 (in); 6 -> 9 (out); {100,101} a separate
    // smaller 2-cycle with a tendril 102 -> 100 — all 'other'
    val edges = Seq((5L, 6L), (6L, 5L), (1L, 5L), (6L, 9L),
      (100L, 101L), (101L, 100L), (102L, 100L)).toDF("src", "dst")
    val cls = Scc.bowTie(edges).as[(Long, String)].collect().toMap
    assert(cls(5L) == "core" && cls(6L) == "core")
    assert(cls(1L) == "in")
    assert(cls(9L) == "out")
    assert(cls(100L) == "other" && cls(101L) == "other" && cls(102L) == "other")
  }

  test("bow-tie core tie-break: equal-size SCCs pick the minimal component id") {
    val edges = Seq((10L, 11L), (11L, 10L), (2L, 3L), (3L, 2L), (2L, 10L))
      .toDF("src", "dst")
    val cls = Scc.bowTie(edges).as[(Long, String)].collect().toMap
    assert(cls(2L) == "core" && cls(3L) == "core", cls.toString)
    assert(cls(10L) == "out" && cls(11L) == "out")
  }

  test("wave guard fails loudly on an adversarial chain when bounded") {
    // maxWaves = 1: wave 1 assigns only SCC(0) (the f = g class), leaving
    // the rest of the chain unassigned — the guard must fire
    val edges = (0 until 6).flatMap { k =>
      val b = 2L * k
      Seq((b, b + 1), (b + 1, b)) ++ (if (k < 5) Seq((b + 1, b + 2)) else Nil)
    }
    val ex = intercept[IllegalArgumentException] {
      Scc.scc(edges.toDF("src", "dst"), maxWaves = 1)
    }
    assert(ex.getMessage.contains("unassigned after"))
  }

  test("long chain of 2-cycles resolves in 2 waves via FW-BW class cut") {
    // 300 SCCs chained: wave 1 colors (f ≡ 0, g = per-SCC) and assigns
    // SCC(0); the (f, g) class cut then DROPS every chain edge, so wave 2
    // assigns all 299 remaining 2-cycles in parallel. Without the class
    // cut this is one peeled SCC per wave (300 waves); without pointer
    // jumping the wave-1 f fixpoint alone needs ~599 one-hop rounds
    // (> maxInner = 200) — maxWaves = 3 / default maxInner pin both.
    val n = 300
    val edges = (0 until n).flatMap { k =>
      val b = 2L * k
      Seq((b, b + 1), (b + 1, b)) ++ (if (k < n - 1) Seq((b + 1, b + 2)) else Nil)
    }
    val got = Scc.scc(edges.toDF("src", "dst"), maxWaves = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 2 * n)
    (0 until n).foreach { k =>
      assert(got(2L * k) == 2L * k && got(2L * k + 1) == 2L * k)
    }
  }

  test("single cycle resolves as one SCC (worst-case label direction)") {
    // one n-node SCC. The f fixpoint (ids DECREASE upstream) doubles via
    // the jump (~log n rounds); the g fixpoint is the adversarial
    // direction — ids ASCEND along its propagation path, lab(v) stays v
    // until the frontier arrives, so the jump has nothing to compose and
    // it pays one hop per round (the O(diameter) worst case the
    // literature's label-propagation SCC shares; maxInner guards it
    // loudly). n stays small so the worst-case path is exercised, not
    // suffered.
    val n = 40L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val got = Scc.scc(edges.toDF("src", "dst")).as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("empty and self-loop-only inputs return an empty assignment") {
    assert(Scc.scc(Seq((7L, 7L), (9L, 9L)).toDF("src", "dst")).count() == 0)
    assert(Scc.scc(Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("result is evaluable with OptimizeLimitZero excluded (seed independence)") {
    // the pre-r14 seed was limit(0) over the initial materialized nodes
    // frame, whose executor blocks are freed in wave 1 — evaluating the
    // result only worked because OptimizeLimitZero pruned the leaf. With
    // the rule excluded, a seed still referencing freed blocks would fail
    // with missing-checkpoint errors; the explicit empty-frame seed must
    // stay evaluable regardless of optimizer configuration.
    val key = "spark.sql.optimizer.excludedRules"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.OptimizeLimitZero")
    try {
      val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      val got = Scc.scc(edges.toDF("src", "dst")).as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L), got.toString)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
