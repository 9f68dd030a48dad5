package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus diversity metrics — the eval card a synthetic-data or
  * generation pipeline reads before training on its own output:
  * distinct-n (Li et al. 2016): the fraction of n-gram OCCURRENCES that
  * are distinct types. A mode-collapsed generator repeats itself and the
  * ratio craters at n = 2,3 long before per-doc quality scores notice.
  *
  * Scale shape: the approx card ([[distinctNApprox]], the 100 TB path)
  * runs ONE corpus scan for ALL n — each doc emits its (n, gram)
  * occurrences for every requested n from a single tokenize + tagged
  * explode, aggregated per n — and is anchored on the requested ns (an n
  * longer than every doc still emits its zero row). The EXACT card
  * ([[distinctN]], the oracle twin) keeps one pass per n: its
  * corpus-sized distinct exchange dominates scan count at any SF where
  * exactness is affordable, and the tagged row stream measured ~2× the
  * per-n passes locally (r16 A/B).
  */
object Diversity {

  /** Shared gram generator: one `(n, gram)` row per positional n-gram
    * occurrence for EVERY n in `ns` (lowercased whitespace tokens, the
    * corpus convention) — the single-scan tagged explode.
    */
  private def taggedGrams(docs: DataFrame, textCol: String,
      ns: Seq[Int]): DataFrame =
    docs.select(
        filter(split(lower(col(textCol)), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= ns.min)
      // n first, grams second: two flat explodes, no struct array and no
      // flatten copy of the combined gram list
      .select(col("toks"), explode(array(ns.map(n => lit(n.toLong)): _*)).as("n"))
      .filter(size(col("toks")) >= col("n"))
      .select(col("n"), explode(transform(
        sequence(lit(0), size(col("toks")) - col("n")),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), col("n"))))).as("gram"))

  /** Per-n gram generator (the [[distinctN]] exact path — see the
    * measurement note there).
    */
  private def grams(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(
        filter(split(lower(col(textCol)), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("gram"))

  /** The |ns|-row anchor frame — left-joining the aggregate to it keeps
    * the card TOTAL (an n with zero grams emits a zero row, not nothing).
    */
  private def nsFrame(docs: DataFrame, ns: Seq[Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    ns.map(_.toLong).toDF("n")
  }

  /** One row per n: total n-gram occurrences, distinct types, and the
    * distinct ratio (round-6; 0.0 for an empty corpus slice so the card
    * is total). EXACT: `count_distinct` partial-aggregates map-side, but
    * the exchange still carries every n-gram TYPE — at web-corpus scale
    * the 2/3-gram type space is corpus-sized, so the 100 TB card is
    * [[distinctNApprox]]; this form is the oracle twin.
    */
  def distinctN(docs: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), s"ns must be positive, got $ns")
    // MEASURED (r16): the single-scan tagged explode costs ~2× here —
    // the per-(n, gram) tagged row stream (struct/flatten or double
    // explode, either variant) is more expensive than the two extra
    // tokenize passes it saves at any SF where the EXACT card is
    // appropriate (the exact distinct's corpus-sized exchange dominates
    // long before scan count does; the 100 TB card is [[distinctNApprox]],
    // which IS single-scan). So the oracle twin keeps one pass per n.
    ns.map { n =>
      grams(docs, textCol, n).agg(
        count(lit(1)).as("total_ngrams"),
        count_distinct(col("gram")).as("distinct_ngrams"))
        .select(lit(n.toLong).as("n"), col("total_ngrams"), col("distinct_ngrams"),
          when(col("total_ngrams") === 0, lit(0.0)) // ANSI-safe on empty slices
            .otherwise(round(col("distinct_ngrams") / col("total_ngrams"), 6))
            .as("distinct_ratio"))
    }.reduce(_ unionAll _)
  }

  /** The scale path: HLL++ `approx_count_distinct(rsd)` over the same
    * gram generator — CONSTANT sketch memory per partition and an
    * exchange carrying one sketch per n instead of the gram-type
    * universe.
    *
    * Two modes. `includeExact = true` (the CARD/oracle mode, q332): rows
    * additionally carry the exact count and a 5σ bound check on the
    * sketch (the q141/q71 card discipline: the oracle replays the exact
    * side, the bound pins the sketch) — this mode still pays the exact
    * distinct's corpus-sized exchange, by design. `includeExact = false`
    * (the PRODUCTION mode): the plan contains NO exact distinct
    * aggregate — only `count` (a plain long) and the sketch cross the
    * exchange, so the 100 TB run costs one map-side pass; rows carry the
    * estimate and its 5σ relative-error radius instead of the bound
    * check (PlanShapeSpec machine-asserts the exact aggregate's absence).
    */
  def distinctNApprox(docs: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3), rsd: Double = 0.02,
      includeExact: Boolean = true): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), s"ns must be positive, got $ns")
    require(rsd > 0 && rsd < 1, s"rsd in (0,1), got $rsd")
    val grams = taggedGrams(docs, textCol, ns)
    if (includeExact) {
      // exact side via the two-level group form (see distinctN) — the
      // sketch aggregates over the (n, gram) GROUP relation, which holds
      // exactly the distinct values, so the HLL estimate is identical
      // (register max is multiplicity-blind)
      val agg = grams.groupBy("n", "gram").agg(count(lit(1)).as("c"))
        .groupBy("n").agg(
          sum(col("c")).as("total"),
          count(lit(1)).as("distinct"),
          approx_count_distinct(col("gram"), rsd).as("apx"))
      nsFrame(docs, ns).join(agg, Seq("n"), "left")
        .select(col("n"),
          coalesce(col("total"), lit(0L)).as("total_ngrams"),
          coalesce(col("distinct"), lit(0L)).as("distinct_ngrams"),
          when(coalesce(col("distinct"), lit(0L)) === 0,
              coalesce(col("apx"), lit(0L)) === 0)
            .otherwise(abs(col("apx") - col("distinct"))
              .cast("double") / col("distinct") <= rsd * 5)
            .as("approx_in_bounds"))
    } else {
      val agg = grams.groupBy("n").agg(
        count(lit(1)).as("total"),
        approx_count_distinct(col("gram"), rsd).as("apx"))
      nsFrame(docs, ns).join(agg, Seq("n"), "left")
        .select(col("n"),
          coalesce(col("total"), lit(0L)).as("total_ngrams"),
          coalesce(col("apx"), lit(0L)).as("approx_distinct"),
          round(lit(5 * rsd) * coalesce(col("apx"), lit(0L)), 2)
            .as("abs_error_5sigma"))
    }
  }
}
