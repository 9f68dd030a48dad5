package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashMode, StableHash}

/** Count-Min sketch heavy hitters — the O(depth×width)-memory frequency
  * path that completes the sketch family (GK quantiles, HLL++ distinct,
  * Bloom membership, CMS counts). An exact term-frequency table shuffles
  * every distinct term; this folds the whole corpus into a fixed-size
  * counter grid in one treeAggregate (no shuffle, task state =
  * depth×width longs), then answers point queries with a zero-shuffle
  * map against the broadcast grid — at 100 TB the memory is the size the
  * operator PICKS (e.g. 4×2²⁰ counters = 32 MB), independent of
  * vocabulary size.
  *
  * Determinism is engine-neutral: row j's bucket for a term is
  * `md5Hash60(term + ":" + j) % width` — exactly the SQL
  * `('0x' || substr(md5(term || ':' || j), 1, 15))::BIGINT % width` —
  * so an oracle replays every counter INCLUDING collision inflation (a
  * CMS estimate is min over rows of the bucket sums, whether a bucket
  * holds one term or many). No RNG, no partition dependence: counter
  * merge is addition, commutative and associative in Long.
  *
  * Standard guarantee (Cormode & Muthukrishnan 2005): est ≥ true count,
  * and est ≤ true + εN with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉. [[CmsSpec]] pins the ≥ side exactly and the
  * equality on a collision-free grid.
  */
object Cms {

  /** One-pass distributed build over every row of `terms(termCol)` (one
    * count per occurrence): per-partition depth×width grids summed
    * through a treeAggregate. Row-major: counter (j, pos) = grid(j*width
    * + pos).
    */
  def build(terms: DataFrame, termCol: String, depth: Int, width: Int,
      mode: HashMode = HashMode.Md5): Array[Long] = {
    require(depth > 0, s"depth must be positive, got $depth")
    require(width > 0, s"width must be positive, got $width")
    val spark = terms.sparkSession
    import spark.implicits._
    terms.select(col(termCol).cast("string")).na.drop()
      .as[String].rdd
      .treeAggregate(new Array[Long](depth * width))(
        seqOp = { (grid, term) =>
          var j = 0
          while (j < depth) {
            val pos = (mode.hash60(term + ":" + j) % width).toInt
            grid(j * width + pos) += 1L
            j += 1
          }
          grid
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
  }

  /** Point-query estimates for each DISTINCT term: (term, est) where est
    * = min over rows j of counter (j, hash_j(term)). One distinct
    * aggregate; the probe itself is a zero-shuffle map against the
    * broadcast grid.
    */
  def estimates(terms: DataFrame, grid: Array[Long], depth: Int,
      termCol: String, outCol: String = "cms_count",
      mode: HashMode = HashMode.Md5): DataFrame = {
    require(depth > 0 && grid.length % depth == 0,
      s"grid length ${grid.length} not a multiple of depth $depth")
    val width = grid.length / depth
    val spark = terms.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(grid)
    terms.select(col(termCol).cast("string")).na.drop().distinct()
      .as[String]
      .map { term =>
        val g = bc.value
        var est = Long.MaxValue
        var j = 0
        while (j < depth) {
          val pos = (mode.hash60(term + ":" + j) % width).toInt
          val c = g(j * width + pos)
          if (c < est) est = c
          j += 1
        }
        (term, est)
      }
      .toDF(termCol, outCol)
  }

  /** Per-document fraction of token OCCURRENCES whose CMS estimate ≥
    * `threshold` — the boilerplate/commonness signal (a doc made of
    * corpus-wide heavy hitters is template text): (idCol, common_frac
    * rounded to 6; empty docs score 0). A pure map against the broadcast
    * grid — zero shuffle, and streaming-composable unchanged
    * (StreamCurationSpec pins stream == batch), unlike [[estimates]]
    * whose distinct aggregate needs the full relation.
    */
  def commonTokenFraction(docs: DataFrame, grid: Array[Long], depth: Int,
      idCol: String, textCol: String, threshold: Long,
      outCol: String = "common_frac", mode: HashMode = HashMode.Md5): DataFrame = {
    require(depth > 0 && grid.length % depth == 0,
      s"grid length ${grid.length} not a multiple of depth $depth")
    val width = grid.length / depth
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(grid)
    docs.select(col(idCol).cast("long"),
        lower(coalesce(col(textCol), lit(""))))
      .as[(Long, String)]
      .map { case (id, text) =>
        val g = bc.value
        var total = 0L
        var common = 0L
        text.split(" ").foreach { t =>
          if (t.nonEmpty) {
            total += 1
            var est = Long.MaxValue
            var j = 0
            while (j < depth) {
              val pos = (mode.hash60(t + ":" + j) % width).toInt
              val c = g(j * width + pos)
              if (c < est) est = c
              j += 1
            }
            if (est >= threshold) common += 1
          }
        }
        val f = if (total == 0L) 0.0 else common.toDouble / total
        (id, math.rint(f * 1e6) / 1e6)
      }
      .toDF(idCol, outCol)
  }

  /** Heavy hitters over lowercase whitespace tokens of `docs(textCol)`:
    * (term, cms_count) for every distinct token whose CMS estimate ≥
    * `threshold`. No false negatives (est ≥ true count): every true
    * heavy hitter appears; collision inflation can only ADD rows, and
    * the small-width regime that surfaces them is exactly what the
    * oracle replays.
    */
  def heavyHitters(docs: DataFrame, textCol: String, depth: Int, width: Int,
      threshold: Long, mode: HashMode = HashMode.Md5): DataFrame = {
    val toks = docs.select(explode(split(lower(coalesce(col(textCol),
      lit(""))), " ")).as("term")).filter(col("term") =!= "")
    val grid = build(toks, "term", depth, width, mode)
    estimates(toks, grid, depth, "term", mode = mode)
      .filter(col("cms_count") >= threshold)
  }
}
