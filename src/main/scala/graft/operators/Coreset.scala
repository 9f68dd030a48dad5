package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** k-center greedy coreset selection (Gonzalez 1985; the "k-Center-Greedy"
  * active-learning/data-selection baseline, e.g. Sener & Savarese 2018):
  * seed with the lowest-id point, then k−1 times pick the point FARTHEST
  * from the selected set (max over points of min over centers), giving the
  * classic 2-approximation to the k-center cover — the "spread the picks
  * out" dual of prototypicality pruning (which keeps cluster cores).
  *
  * Scale shape: the corpus never moves. Each round is one pure map
  * (update the running min-distance against the ONE newly broadcast
  * center) plus one bounded TakeOrdered(1) argmax — k rounds = k jobs,
  * k vectors ever collected, no shuffle of the corpus at all. The
  * working relation is cached; lineage grows one `least(...)` column per
  * round (k is tens-to-hundreds in practice).
  *
  * Engine-neutral determinism: distances round to 6 BEFORE every argmax
  * and ties break by ascending id (the [[Mmr]] convention), so an SQL
  * engine unrolling the rounds (q204) walks the identical pick chain.
  * Output: (rank, id, d) — d = the pick's distance to the previously
  * selected set (the greedy coverage radius, 0 for the seed; the radius
  * sequence is non-increasing and is the stopping signal a
  * coverage-targeted selection reads).
  */
object Coreset {

  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String, k: Int,
      metric: String = "EUCLIDEAN"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
      .na.drop() // a point without id or vector can't be covered or picked

    // deterministic seed: the lowest id
    val seedRow = base.orderBy(col("id")).limit(1).collect()
    require(seedRow.nonEmpty, "kCenterGreedy: empty input")
    val seed = (seedRow(0).getLong(0), seedRow(0).getSeq[Float](1).toArray)

    def d6To(center: Array[Float]) =
      round(VectorFunctions.distance(col("vec"), typedLit(center), metric), 6)

    val picks = Seq.newBuilder[(Int, Long, Double)]
    picks += ((1, seed._1, 0.0))
    var work = base.filter(col("id") =!= seed._1)
      .withColumn("mind", d6To(seed._2))
      .cache()
    var r = 2
    while (r <= k) {
      val far = work.orderBy(col("mind").desc, col("id")).limit(1).collect()
      if (far.isEmpty) { r = k + 1 } // fewer than k points: stop
      else {
        val id = far(0).getLong(0)
        val vec = far(0).getSeq[Float](1).toArray
        picks += ((r, id, far(0).getDouble(2)))
        val prev = work
        work = work.filter(col("id") =!= id)
          .withColumn("mind", least(col("mind"), d6To(vec)))
          .cache()
        work.count() // materialize before unpersisting the parent
        prev.unpersist()
        r += 1
      }
    }
    work.unpersist()
    picks.result().toDF("rank", "id", "d")
  }
}
