package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle/clustering contracts on closed-form graphs: complete graphs,
  * triangle-free stars/paths, the one-closing-edge case, and input
  * direction-insensitivity (the operator symmetrizes).
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 has exactly 4 triangles and clustering 1 everywhere") {
    val k4 = (for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j))
      .toDF("src", "dst")
    assert(Triangles.triangles(k4).count() == 4)
    val cc = Triangles.clusteringCoefficients(k4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(cc.forall { case (_, deg, tri, c) => deg == 3 && tri == 3 && c == 1.0 },
      cc.toSeq.toString)
  }

  test("stars and paths are triangle-free; one chord closes exactly one") {
    val star = (1L until 8L).map(i => (0L, i)).toDF("src", "dst")
    assert(Triangles.triangles(star).count() == 0)
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(Triangles.triangles(path).count() == 0)
    val chord = star.union(Seq((1L, 2L)).toDF("src", "dst"))
    val tri = Triangles.triangles(chord).collect()
    assert(tri.length == 1)
    assert(tri(0).toSeq.toSet.asInstanceOf[Set[Long]] == Set(0L, 1L, 2L))
  }

  test("weighted clustering: unit weights reduce to the unweighted coefficient") {
    // K4 + chord fixture: every triangle contributes (1+1)/2 = 1 and
    // strength == degree, so clustering_w == clustering exactly
    val edges = (for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j))
      .toDF("src", "dst")
    val unw: Map[Long, (Long, Long, Double)] = Triangles.clusteringCoefficients(edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val w: Map[Long, (Long, Double, Long, Double)] =
      Triangles.weightedClusteringCoefficients(edges.withColumn("w", lit(1.0)))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(unw.keySet == w.keySet)
    unw.foreach { case (id, (deg, tri, c)) =>
      val (wdeg, strength, wtri, cw) = w(id)
      assert(wdeg == deg && wtri == tri)
      assert(strength == deg.toDouble, s"unit strength must equal degree: $id")
      assert(math.abs(cw - c) < 1e-12, s"node $id: $cw vs $c")
    }
  }

  test("weighted clustering: strong closures outrank borderline ones at equal counts") {
    // two disjoint triangles: {0,1,2} all weights 10, {10,11,12} all 0.1,
    // each node also pends one heavy neutral edge so strengths differ
    // from pure triangle weight — Barrat normalizes by strength·(deg−1)
    val edges = Seq(
      (0L, 1L, 10.0), (1L, 2L, 10.0), (2L, 0L, 10.0),
      (10L, 11L, 0.1), (11L, 12L, 0.1), (12L, 10L, 0.1),
      (0L, 100L, 5.0), (10L, 200L, 5.0)).toDF("src", "dst", "w")
    val c = Triangles.weightedClusteringCoefficients(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // node 0: one triangle contributing 10+10 = 20; strength 25, deg 3 ->
    // 20 / (25 * 2) = 0.4; node 10: 0.2 / (5.2 * 2) ~ 0.019
    assert(math.abs(c(0L) - 20.0 / 50.0) < 1e-12, s"node 0: ${c(0L)}")
    assert(math.abs(c(10L) - 0.2 / 10.4) < 1e-12, s"node 10: ${c(10L)}")
    assert(c(0L) > c(10L) * 10, "strong triangle must dominate")
    // pure-triangle corners score exactly 1 regardless of the weight scale
    assert(math.abs(c(1L) - 1.0) < 1e-12 && math.abs(c(11L) - 1.0) < 1e-12,
      s"corner nodes: ${c(1L)} / ${c(11L)}")
  }

  test("modularity: planted communities score high, the trivial partition zero") {
    // two K5s joined by one bridge edge
    val k5a = for (i <- 0L until 5L; j <- 0L until 5L if i < j) yield (i, j)
    val k5b = for (i <- 10L until 15L; j <- 10L until 15L if i < j) yield (i, j)
    val edges = (k5a ++ k5b :+ ((4L, 10L))).toDF("src", "dst")
    def q(asg: Seq[(Long, Long)]): (Long, Long, Double) = {
      val r = Triangles.modularity(edges, asg.toDF("id", "community")).head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val good = (0L until 5L).map(i => (i, 0L)) ++ (10L until 15L).map(i => (i, 1L))
    val (nc, ne, qGood) = q(good)
    assert(nc == 2 && ne == 21, s"$nc communities / $ne edges")
    // closed form: e_c = 10 intra each, d_c = 21 per side ->
    // Q = 2 * (10/21 - (21/42)^2) = 20/21 - 1/2
    assert(math.abs(qGood - (20.0 / 21 - 0.5)) < 1e-12, s"Q = $qGood")
    // one community holding everything scores exactly 0
    val (_, _, qAll) = q((0L until 5L).map(i => (i, 0L)) ++
      (10L until 15L).map(i => (i, 0L)))
    assert(math.abs(qAll) < 1e-12, s"trivial partition Q = $qAll")
    assert(qGood > 0.4, s"planted partition must score high: $qGood")
    // incomplete assignments fail loudly instead of skewing Q
    val e = intercept[IllegalArgumentException](
      Triangles.modularity(edges, Seq((0L, 0L)).toDF("id", "community")))
    assert(e.getMessage.contains("covers"))
  }

  test("direction and duplication of input edges never change the count") {
    val base = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("src", "dst")
    val messy = base
      .union(Seq((1L, 0L), (0L, 2L), (1L, 0L)).toDF("src", "dst"))
    assert(Triangles.triangles(base).count() == 1)
    assert(Triangles.triangles(messy).count() == 1)
    val card = Triangles.densityCard(messy).collect()(0)
    assert(card.getLong(0) == 4 && card.getLong(1) == 4 && card.getLong(2) == 1,
      card.toString)
  }

  test("weighted modularity: closed form on heavy triangles over a light bridge; unit weights reduce exactly") {
    import spark.implicits._
    val edges = Seq((0L, 1L, 10.0), (1L, 2L, 10.0), (0L, 2L, 10.0),
      (3L, 4L, 10.0), (4L, 5L, 10.0), (3L, 5L, 10.0), (2L, 3L, 1.0))
      .toDF("src", "dst", "w")
    val asg = (0L to 5L).map(i => (i, i / 3)).toDF("id", "community")
    val q = Triangles.modularity(edges, asg, weightCol = Some("w"))
      .collect()(0)
    // W = 61; each side: w_c = 30, s_c = 61 -> Q = 2*(30/61 - 0.25)
    assert(q.getLong(1) == 61L)
    assert(math.abs(q.getDouble(2) - 2 * (30.0 / 61 - 0.25)) < 1e-9, q.toString)
    // w ≡ 1.0 equals the unweighted form bit-for-bit
    val unit = edges.withColumn("w", lit(1.0))
    val a = Triangles.modularity(unit, asg, weightCol = Some("w")).collect()(0)
    val b = Triangles.modularity(edges.drop("w"), asg).collect()(0)
    assert(a.getDouble(2) == b.getDouble(2))
  }

  test("degree card: exact log-log fit on a constructed two-point histogram") {
    // 8 nodes of in-degree 1, 2 nodes of in-degree 4:
    // points (ln1, ln8), (ln4, ln2) -> slope = (ln2-ln8)/(ln4-ln1) = -1
    val deg1 = (0 until 8).map(i => (100L + i, i.toLong))
    val deg4 = (0 until 2).flatMap(j => (0 until 4).map(i => (200L + 4 * j + i, 50L + j)))
    val edges = (deg1 ++ deg4).toDF("src", "dst")
    val card = Triangles.degreeCard(edges).collect()(0)
    assert(card.getLong(0) == 2)
    assert(math.abs(card.getDouble(1) - (-1.0)) < 1e-9, card.toString)
    // intercept: y = ln8 at x = ln1 = 0 -> intercept = ln8
    assert(math.abs(card.getDouble(2) - math.log(8)) < 1e-9)
    // degenerate single-degree histogram: slope undefined -> null
    val uni = (0 until 5).map(i => (i.toLong, 100L + i)).toDF("src", "dst")
    val u = Triangles.degreeCard(uni).collect()(0)
    assert(u.getLong(0) == 1 && u.isNullAt(1) && u.isNullAt(2))
  }

  test("health card: reciprocity and assortativity closed forms") {
    // 2-cycle {0,1} (both edges reciprocated) + chain 2->3 (not)
    val g = Seq((0L, 1L), (1L, 0L), (2L, 3L)).toDF("src", "dst")
    val card = Triangles.healthCard(g).collect()(0)
    assert(card.getLong(0) == 4 && card.getLong(1) == 3)
    assert(math.abs(card.getDouble(2) - 2.0 / 3) < 1e-6, card.toString)
    // star out of one hub: every edge pairs (od=k, ind=1) -> corr undefined
    // (zero variance both sides) -> null assortativity
    val star = (1L until 6L).map(i => (0L, i)).toDF("src", "dst")
    val sc = Triangles.healthCard(star).collect()(0)
    assert(sc.getDouble(2) == 0.0, "no reciprocated edges")
    assert(sc.isNullAt(3), "constant degrees: correlation undefined")
  }
}
