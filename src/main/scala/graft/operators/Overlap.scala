package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based corpus-overlap card: how much of slice A's vocabulary
  * (token/n-gram/url/id universe) does slice B share? The question every
  * mixture/decontamination decision asks first — and at 100 TB the exact
  * answer (a distinct-intersection join) shuffles two corpus-sized type
  * universes. The scale path: ONE HLL++ sketch per side plus one for the
  * union (each a map-side partial aggregate; only three fixed-size
  * sketches cross an exchange), intersection by inclusion–exclusion
  * |A∩B| = |A| + |B| − |A∪B|.
  *
  * Scale shape: ONE pass over each side — the per-side and union
  * aggregates compute in a single `rollup(side)` grouping-set pass
  * (previously the union leg re-scanned and re-tokenized both sides), so
  * each input's key/gram pipeline runs exactly once; the grouping-set
  * expansion doubles the aggregate's input rows but they partial-combine
  * map-side, and the final exchange still carries only per-(set, key)
  * partials. The identical aggregate expressions see the identical key
  * multisets, so every count and sketch estimate is unchanged.
  *
  * Card discipline (q141/q71): in CARD mode (`includeExact = true`) the
  * output carries the EXACT counts (oracle-recomputable by DuckDB)
  * beside a bound check on the sketch — the inclusion–exclusion
  * estimate must sit within 5σ of each input sketch's relative error,
  * i.e. within 5·rsd·(|A|+|B|+|A∪B|) of the exact intersection. A
  * production run at 100 TB uses `includeExact = false`, whose PLAN
  * contains no exact distinct aggregate at all — the sketches are the
  * only thing computed, not merely the only thing read.
  */
object Overlap {

  /** One-row overlap card between the `keyCol` universes of `a` and `b`.
    *
    * `includeExact = true` (the CARD/oracle mode, q335): (n_a, n_b,
    * n_union, n_intersect, jaccard, approx_in_bounds) — exact side via
    * count_distinct (oracle-recomputable), sketch side via
    * approx_count_distinct(rsd) over each slice and their union; this
    * mode still pays the exact distinct's corpus-sized exchange, by
    * design. `includeExact = false` (the PRODUCTION mode): the plan
    * contains NO exact distinct aggregate — only three fixed-size HLL++
    * sketches cross an exchange; the row carries the inclusion–exclusion
    * estimate, the approx jaccard, and the 5σ absolute-error radius
    * (PlanShapeSpec machine-asserts the exact aggregate's absence).
    */
  def overlapCard(a: DataFrame, b: DataFrame, keyCol: String,
      rsd: Double = 0.02, includeExact: Boolean = true): DataFrame = {
    require(rsd > 0 && rsd < 1, s"overlapCard: rsd in (0,1), got $rsd")
    // side-tagged single pass: rollup(side) = grouping sets ((side), ())
    // — the () set IS the union aggregate, so neither input scans twice
    val tagged = a.select(col(keyCol).as("k"), lit("a").as("side"))
      .unionByName(b.select(col(keyCol).as("k"), lit("b").as("side")))
    def pick(side: String, c: String) =
      max(when(col("side") === side, col(c)))
    def pickUnion(c: String) = max(when(col("side").isNull, col(c)))
    if (includeExact) {
      val g = tagged.rollup("side").agg(
        count_distinct(col("k")).as("n"),
        approx_count_distinct(col("k"), rsd).as("apx"))
      g.agg(
          coalesce(pick("a", "n"), lit(0L)).as("n_a"),
          coalesce(pick("b", "n"), lit(0L)).as("n_b"),
          coalesce(pickUnion("n"), lit(0L)).as("n_union"),
          coalesce(pick("a", "apx"), lit(0L)).as("apx_a"),
          coalesce(pick("b", "apx"), lit(0L)).as("apx_b"),
          coalesce(pickUnion("apx"), lit(0L)).as("apx_u"))
        .select(col("n_a"), col("n_b"), col("n_union"),
          (col("n_a") + col("n_b") - col("n_union")).as("n_intersect"),
          when(col("n_union") === 0, lit(0.0))
            .otherwise(round((col("n_a") + col("n_b") - col("n_union"))
              .cast("double") / col("n_union"), 6)).as("jaccard"),
          (abs((col("apx_a") + col("apx_b") - col("apx_u")) -
              (col("n_a") + col("n_b") - col("n_union"))).cast("double") <=
            lit(5 * rsd) * (col("n_a") + col("n_b") + col("n_union")))
            .as("approx_in_bounds"))
    } else {
      val g = tagged.rollup("side").agg(
        approx_count_distinct(col("k"), rsd).as("apx"))
      g.agg(
          coalesce(pick("a", "apx"), lit(0L)).as("apx_a"),
          coalesce(pick("b", "apx"), lit(0L)).as("apx_b"),
          coalesce(pickUnion("apx"), lit(0L)).as("apx_u"))
        .select(col("apx_a"), col("apx_b"), col("apx_u"),
          (col("apx_a") + col("apx_b") - col("apx_u")).as("apx_intersect"),
          when(col("apx_u") === 0, lit(0.0))
            .otherwise(round((col("apx_a") + col("apx_b") - col("apx_u"))
              .cast("double") / col("apx_u"), 6)).as("jaccard_approx"),
          round(lit(5 * rsd) *
            (col("apx_a") + col("apx_b") + col("apx_u")), 2)
            .as("abs_error_5sigma"))
    }
  }

  /** n-gram-vocabulary overlap between two document slices — overlapCard
    * over the lowercased whitespace n-gram universes (the corpus
    * convention), the concrete form a mixture/transfer decision reads
    * ("how much of the new slice's phrasing is already covered?").
    * `n = 1` is the raw token vocabulary; higher n discriminates corpora
    * whose token inventories saturate (any two large slices share most
    * unigrams — the n-gram universe is where the overlap signal lives).
    */
  def vocabOverlapCard(docsA: DataFrame, docsB: DataFrame, textCol: String,
      n: Int = 1, rsd: Double = 0.02, includeExact: Boolean = true): DataFrame = {
    require(n >= 1, s"vocabOverlapCard: n >= 1, got $n")
    def grams(d: DataFrame) = d
      .select(filter(split(lower(col(textCol)), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("gram"))
    overlapCard(grams(docsA), grams(docsB), "gram", rsd, includeExact)
  }
}
