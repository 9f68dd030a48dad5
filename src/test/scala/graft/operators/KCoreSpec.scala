package graft.operators

import graft.SparkSpec

/** k-core contracts: cascade peeling (a path's 2-core is empty and takes
  * ~N/2 rounds — the case the fixture's cycle deliberately avoids), clique
  * survival, loud non-convergence at maxRounds, and membership ordering.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("a path's 2-core peels to empty via end cascades") {
    val path = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(KCore.kCoreEdges(path, k = 2).count() == 0)
  }

  test("insufficient maxRounds fails loudly instead of returning a non-core") {
    val path = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException](
      KCore.kCoreEdges(path, k = 2, maxRounds = 3))
    assert(e.getMessage.contains("no fixpoint"))
  }

  test("K4 with a pendant tail: the 3-core is exactly the K4") {
    val k4 = (for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j))
    val tail = Seq((3L, 10L), (10L, 11L))
    val core = KCore.kCoreEdges((k4 ++ tail).toDF("src", "dst"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == (for (i <- 0L until 4L; j <- 0L until 4L if i != j)
      yield (i, j)).toSet, core.toString)
  }

  test("coreMembership: max core per node, ks must be ascending") {
    val k4 = (for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j))
    val ring = (10L until 16L).map(i => (i, if (i == 15L) 10L else i + 1))
    val edges = (k4 ++ ring :+ ((3L, 10L))).toDF("src", "dst")
    val m = KCore.coreMembership(edges, ks = Seq(2, 3))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0L until 4L).forall(m(_) == 3), m.toString)
    assert((10L until 16L).forall(m(_) == 2), m.toString)
    val e = intercept[IllegalArgumentException](
      KCore.coreMembership(edges, ks = Seq(3, 2)))
    assert(e.getMessage.contains("ascending"))
  }
}
