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

  test("coreness == max{k : node in k-core} on K4 with a pendant tail") {
    val k4 = (for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j))
    val tail = Seq((3L, 10L), (10L, 11L))
    val edges = (k4 ++ tail).toDF("src", "dst")
    val c = KCore.coreness(edges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // K4 members peel at k=4 -> coreness 3; the tail peels at k=2 -> 1
    assert((0L until 4L).forall(c(_) == 3), c.toString)
    assert(c(10L) == 1 && c(11L) == 1, c.toString)
    // cross-check the definition against independent from-scratch peels
    for (k <- 1 to 4) {
      val members = KCore.kCoreEdges(edges, k)
        .select("src").distinct().collect().map(_.getLong(0)).toSet
      c.foreach { case (id, core) =>
        assert(members.contains(id) == (core >= k),
          s"node $id coreness $core vs k=$k membership ${members.contains(id)}")
      }
    }
  }

  test("nested coreMembership equals independent from-scratch peels") {
    // cycle + K5 (the q296 fixture shape, smaller): peels at each k from
    // the previous core must match peels from the original edge set
    val n = 60L
    val cyc = (0L until n).map(i => (i, (i + 1) % n))
    val k5 = for (b <- Seq(0L, 20L, 40L); i <- 0L until 5L; j <- 0L until 5L
      if i < j) yield (b + i, b + j)
    val edges = (cyc ++ k5).toDF("src", "dst")
    val nested = KCore.coreMembership(edges, ks = Seq(2, 3, 4))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (k <- Seq(2, 3, 4)) {
      val members = KCore.kCoreEdges(edges, k)
        .select("src").distinct().collect().map(_.getLong(0)).toSet
      nested.foreach { case (id, mc) =>
        assert(members.contains(id) == (mc >= k),
          s"node $id max_core $mc vs k=$k membership ${members.contains(id)}")
      }
    }
  }

  test("s-core: unit weights at s=k equal the k-core; strength respects weights") {
    val k4 = (for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j))
    val tail = Seq((3L, 10L), (10L, 11L))
    val unit = (k4 ++ tail).map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "w")
    val sCore = KCore.sCoreEdges(unit, s = 3.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kCore = KCore.kCoreEdges((k4 ++ tail).toDF("src", "dst"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sCore == kCore, "unit-weight s-core must equal the k-core")
    // one strong edge outweighs two weak ones: the heavy pair survives a
    // threshold the unweighted degree could never reach
    val weighted = Seq((0L, 1L, 10.0), (1L, 2L, 0.5), (2L, 3L, 0.5))
      .toDF("src", "dst", "w")
    val strong = KCore.sCoreEdges(weighted, s = 7.5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong == Set((0L, 1L), (1L, 0L)), strong.toString)
    // zero/negative weights are dropped, loud bad threshold
    val e = intercept[IllegalArgumentException](KCore.sCoreEdges(weighted, s = 0.0))
    assert(e.getMessage.contains("must be > 0"))
  }

  test("string ids: host-graph cores peel without casts") {
    val tri = Seq(("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"),
      ("c.com", "tail.net"))
    val core = KCore.kCoreEdges(tri.toDF("src", "dst"), k = 2)
      .select("src").distinct().collect().map(_.getString(0)).toSet
    assert(core == Set("a.com", "b.com", "c.com"), core.toString)
    val c = KCore.coreness(tri.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(c("a.com") == 2 && c("tail.net") == 1, c.toString)
  }
}
