package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Run BOTH execution paths (driver union-find and distributed label
    * propagation — threshold 0 forces the loop) and pin them equal before
    * returning; every case in this suite therefore tests both.
    */
  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("id_a", "id_b")
    val driver = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Dedup.connectedComponents(df, driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == distributed, "driver and distributed CC paths disagree")
    driver
  }

  test("chains, triangles and singleton components resolve to min labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges within iteration budget (diameter > 1 round)") {
    val path = (0L until 15L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 16)
  }

  test("random graph matches driver-side union-find") {
    val rnd = new scala.util.Random(17)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val got = cc(pairs)
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> find(v)).toMap
    // normalize union-find roots to min-of-component
    val byRoot = expected.groupBy(_._2).view.mapValues(_.keys.min).toMap
    val want = expected.map { case (v, r) => v -> byRoot(r) }
    assert(got == want)
  }

  test("1,000-node chain (diameter 999) converges distributed in O(log n) rounds") {
    // pre-pointer-jumping, min-label propagation needed O(diameter) rounds
    // and SILENTLY returned split clusters past maxIterations = 20 — the
    // class of component templated near-dup drift produces. The doubling
    // step must close this chain well inside the default budget.
    val chain = (0L until 999L).map(i => (i, i + 1))
    val edges = chain.toDF("id_a", "id_b")
      .select(col("id_a").as("s"), col("id_b").as("t"))
      .unionByName(chain.toDF("id_a", "id_b")
        .select(col("id_b").as("s"), col("id_a").as("t")))
    val (labels, rounds, converged) = Dedup.propagateMinLabels(edges, maxIterations = 20)
    assert(converged, s"chain did not converge in 20 rounds")
    assert(rounds <= 15, s"expected O(log 1000) ~ 10-12 rounds, took $rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1000 && got.values.toSet == Set(0L))
    // the public entry point agrees (forced onto the distributed path) and
    // matches union-find
    val viaPublic = Dedup.connectedComponents(chain.toDF("id_a", "id_b"),
        driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPublic == got)
  }

  test("non-convergence fails loudly instead of returning split clusters") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain.toDF("id_a", "id_b"),
        maxIterations = 2, driverEdgeThreshold = 0)
    }
    assert(ex.getMessage.contains("still changing"))
  }

  test("keepBestPerCluster keeps the highest score, ties to lowest id") {
    // clusters: {1,2,3} scores (5,9,9) -> keep 2; {10,11} (4,4) -> keep 10;
    // 20 is a singleton (kept, self-cluster)
    val docs = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (10L, 4.0), (11L, 4.0),
      (20L, 7.0)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.keepBestPerCluster(docs, "doc_id", "score", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      1L -> ((1L, false)), 2L -> ((1L, true)), 3L -> ((1L, false)),
      10L -> ((10L, true)), 11L -> ((10L, false)),
      20L -> ((20L, true))))
  }
}
