package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Katz contracts: closed forms on chain and star, truncation tail
  * bound, and condensation of a two-SCC digraph.
  */
class KatzSpec extends SparkSpec {
  import spark.implicits._

  test("directed chain: closed-form partial geometric sums") {
    // 0 -> 1 -> 2; c_t computable by hand with alpha = 0.5, t = 3:
    // c(0) = 1 (no in-edges); c(1) = 1 + 0.5*c(0) = 1.5
    // c(2) = 1 + 0.5*c(1) = 1.75
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val c = Katz.katz(chain, iters = 3, alpha = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(c(0L) == 1.0 && c(1L) == 1.5 && c(2L) == 1.75, c.toString)
  }

  test("in-star: center accumulates alpha per leaf, leaves stay at 1") {
    val star = (1L until 9L).map(i => (i, 0L)).toDF("src", "dst")
    val c = Katz.katz(star, iters = 5, alpha = 0.1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(c(0L) - (1.0 + 8 * 0.1)) < 1e-12)
    (1L until 9L).foreach(i => assert(c(i) == 1.0))
  }

  test("iteration tail shrinks geometrically (cycle fixed point)") {
    // 4-cycle: fixed point c* = 1/(1-alpha); iterates approach it
    val cyc = (0L until 4L).map(i => (i, (i + 1) % 4)).toDF("src", "dst")
    val a = 0.3
    val c10 = Katz.katz(cyc, 10, a).as[(Long, Double)].collect().map(_._2)
    val fixed = 1.0 / (1.0 - a)
    c10.foreach(v => assert(math.abs(v - fixed) < math.pow(a, 9), v.toString))
  }

  test("condense collapses SCCs and counts cross-edge multiplicity") {
    // two 2-cycles {0,1} and {2,3}; two parallel-ish cross edges 1->2, 0->3
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L), (1L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val cond = Scc.condense(edges, Scc.scc(edges))
      .as[(Long, Long, Long)].collect().toSet
    assert(cond == Set((0L, 2L, 2L)), cond.toString)
  }
}
