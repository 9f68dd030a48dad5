package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus diversity metrics — the eval card a synthetic-data or
  * generation pipeline reads before training on its own output:
  * distinct-n (Li et al. 2016): the fraction of n-gram OCCURRENCES that
  * are distinct types. A mode-collapsed generator repeats itself and the
  * ratio craters at n = 2,3 long before per-doc quality scores notice.
  *
  * Scale shape: per n, one explode + ONE aggregate — `count_distinct`
  * partial-aggregates map-side, so the exchange carries (gram, partial)
  * pairs, not the corpus; nothing is windowed, nothing collects. The
  * card is |ns| rows.
  */
object Diversity {

  /** Shared gram generator: one `gram` row per positional n-gram
    * occurrence (lowercased whitespace tokens, the corpus convention).
    */
  private def grams(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(
        filter(split(lower(col(textCol)), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("gram"))

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
    ns.map { n =>
      if (includeExact)
        grams(docs, textCol, n).agg(
          count(lit(1)).as("total_ngrams"),
          count_distinct(col("gram")).as("distinct_ngrams"),
          approx_count_distinct(col("gram"), rsd).as("approx"))
          .select(lit(n.toLong).as("n"), col("total_ngrams"), col("distinct_ngrams"),
            when(col("distinct_ngrams") === 0, col("approx") === 0)
              .otherwise(abs(col("approx") - col("distinct_ngrams"))
                .cast("double") / col("distinct_ngrams") <= rsd * 5)
              .as("approx_in_bounds"))
      else
        grams(docs, textCol, n).agg(
          count(lit(1)).as("total_ngrams"),
          approx_count_distinct(col("gram"), rsd).as("approx_distinct"))
          .select(lit(n.toLong).as("n"), col("total_ngrams"),
            col("approx_distinct"),
            round(lit(5 * rsd) * col("approx_distinct"), 2).as("abs_error_5sigma"))
    }.reduce(_ unionAll _)
  }
}
