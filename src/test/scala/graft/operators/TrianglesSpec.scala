package graft.operators

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
}
