package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heaps'-law vocabulary-growth fit — V(N) ≈ K·N^β over the corpus read
  * in doc-id order: the companion card to the Zipf rank-frequency fit
  * (q185), and the practical answer to "how fast does the vocabulary
  * (and every vocab-keyed structure: BPE merges, hash domains, sketch
  * load) grow as this corpus scales?" β well below 1 is the healthy
  * sub-linear regime; β near 1 flags an unbounded-id-like token stream.
  *
  * Window-free at scale (the q185 discipline): per-doc token counts and
  * per-doc NEW-type counts (a term's min doc id marks its first
  * appearance) are plain aggregates; both running totals come from
  * [[Ranking.exclusivePrefixSum]] — a range shuffle each, no
  * single-partition window; the closed-form log-log regression is one
  * aggregate. Engine-parity: the oracle replays the windows and the
  * regression; outputs round to 6.
  */
object Heaps {

  /** One-row card: (n_points, beta, log_k) from the least-squares fit of
    * ln V on ln N over per-doc checkpoints (docs where both totals are
    * positive).
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("_hid"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val perDocN = toks.groupBy("_hid").agg(count(lit(1)).as("n"))
    val newPerDoc = toks.groupBy("term").agg(min(col("_hid")).as("_hid"))
      .groupBy("_hid").agg(count(lit(1)).as("v"))
    val perDoc = docs.select(col(idCol).as("_hid"))
      .join(perDocN, Seq("_hid"), "left")
      .join(newPerDoc, Seq("_hid"), "left")
      .select(col("_hid"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("v"), lit(0L)).as("v"))
    val withN = Ranking.exclusivePrefixSum(perDoc, Seq("_hid"), "n", "cb_n")
    val withV = Ranking.exclusivePrefixSum(withN, Seq("_hid"), "v", "cb_v")
    val pts = withV
      .select((col("cb_n") + col("n")).as("N"), (col("cb_v") + col("v")).as("V"))
      .filter(col("N") > 0 && col("V") > 0)
      .select(log(col("N").cast("double")).as("lx"),
        log(col("V").cast("double")).as("ly"))
    // degenerate corpus (a single distinct N across checkpoints, or no
    // checkpoints at all): the slope is undefined — report beta 0 with
    // log_k = mean(ln V), keeping the card total (ANSI-safe, no 0/0)
    val slope = when(coalesce(var_pop(col("lx")), lit(0.0)) === 0.0, lit(0.0))
      .otherwise(covar_pop(col("ly"), col("lx")) / var_pop(col("lx")))
    pts.agg(
      count(lit(1)).as("n_points"),
      round(slope, 6).as("beta"),
      round(coalesce(avg(col("ly")), lit(0.0)) -
        slope * coalesce(avg(col("lx")), lit(0.0)), 6).as("log_k"))
  }
}
