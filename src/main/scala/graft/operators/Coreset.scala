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

  /** Row shape for the grouped greedy (public for the Dataset encoder). */
  case class GCand(g: Long, id: Long, vec: Array[Float])

  /** Per-group k-center greedy — the per-domain diversity sampler
    * ("the k most spread-out examples of every language/source"): same
    * greedy, same determinism rules (round-6 distances, id ties, lowest
    * id seeds), but each group's selection runs in-task over its bounded
    * member set via flatMapGroups (the [[Mmr]] shape: ONE group-keyed
    * shuffle, no window, no driver rounds at all — the group bound is
    * what buys back the per-round jobs of the global form).
    */
  def kCenterPerGroup(df: DataFrame, groupCol: String, idCol: String,
      vecCol: String, k: Int, metric: String = "EUCLIDEAN",
      maxGroupSize: Int = 100000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val metricId = graft.functions.DistanceKernels.metricId(metric)
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    df.select(col(groupCol).cast("long").as("g"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .na.drop().as[GCand]
      .groupByKey(_.g).flatMapGroups { (g, it) =>
        val members = it.toArray.sortBy(_.id)
        require(members.length <= maxGroupSize,
          s"group $g has ${members.length} members > maxGroupSize " +
            s"$maxGroupSize — pre-sample the group first")
        val n = members.length
        val mind = Array.fill(n)(Double.MaxValue)
        val taken = Array.fill(n)(false)
        val out = Seq.newBuilder[(Long, Int, Long, Double)]
        var center = 0 // lowest id seeds
        var r = 1
        var d = 0.0
        while (r <= math.min(k, n)) {
          taken(center) = true
          out += ((g, r, members(center).id, d))
          var best = -1; var bestD = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val di = r6(graft.functions.DistanceKernels.computeArrays(
                members(i).vec, members(center).vec, metricId))
              if (di < mind(i)) mind(i) = di
              if (mind(i) > bestD ||
                  (mind(i) == bestD && members(i).id < members(best).id)) {
                best = i; bestD = mind(i)
              }
            }
            i += 1
          }
          center = best; d = bestD
          r += 1
        }
        out.result().iterator
      }
      .toDF(groupCol, "rank", "id", "d")
  }
}
