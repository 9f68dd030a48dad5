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

  /** One row per n: total n-gram occurrences, distinct types, and the
    * distinct ratio (round-6; 0.0 for an empty corpus slice so the card
    * is total). Tokenization: lowercased whitespace split, the corpus
    * convention.
    */
  def distinctN(docs: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), s"ns must be positive, got $ns")
    val toks = docs.select(
      filter(split(lower(col(textCol)), " "), t => t =!= "").as("toks"))
    ns.map { n =>
      val grams = toks
        .filter(size(col("toks")) >= n)
        .select(explode(transform(
          sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("gram"))
      grams.agg(
        count(lit(1)).as("total_ngrams"),
        count_distinct(col("gram")).as("distinct_ngrams"))
        .select(lit(n.toLong).as("n"), col("total_ngrams"), col("distinct_ngrams"),
          when(col("total_ngrams") === 0, lit(0.0)) // ANSI-safe on empty slices
            .otherwise(round(col("distinct_ngrams") / col("total_ngrams"), 6))
            .as("distinct_ratio"))
    }.reduce(_ unionAll _)
  }
}
