package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model surprisal: p(tok) = corpusCount(tok)/totalTokens,
  * doc score = mean token surprisal `Σ k·(−ln p) / Σ k` in nats. The cheap
  * LM-quality signal corpus filters threshold on — abnormally LOW surprisal
  * flags boilerplate/repetitive text, abnormally HIGH flags garbage
  * vocabulary. Complements the heuristic scores (gopherFlags,
  * qualityScore) with a corpus-relative statistic.
  *
  * Scale shape: per-(doc, token) multiplicities first (one shuffle of
  * distinct doc-token pairs, map-side combined), vocabulary counts
  * aggregate from THAT frame (vocabulary-sized, not corpus-sized), the
  * 1-row total broadcasts, and the multiplicity⋈vocabulary join shuffles
  * 8-byte-keyed pairs — no pass ever carries O(corpus tokens) through an
  * exchange twice. Zero-token documents are absent from the output (they
  * have no mean).
  */
object UnigramLm {

  def surprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(coalesce(col(textCol), lit(""))))).as("tok"))
    // materialize the multiplicity relation ONCE: it feeds the
    // vocabulary aggregate AND the scoring join, and Catalyst does not
    // dedupe common subplans across join legs — unmaterialized, every
    // consumer re-runs the corpus tokenize+explode scan (q280's plan
    // carried 16 parquet scans before this family was materialized)
    val m = Materialize.view(
      toks.groupBy("id", "tok").agg(count(lit(1)).cast("double").as("k")))
    val cnt = m.groupBy("tok").agg(sum(col("k")).as("c"))
    val tot = cnt.agg(sum(col("c")).as("t"))
    m.join(cnt, Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(round(sum(col("k") * -log(col("c") / col("t"))) / sum(col("k")), 6)
        .as("surprisal"))
  }

  /** Bigram conditional surprisal: mean `−ln p(wᵢ | wᵢ₋₁)` over a doc's
    * token transitions, with `p(w|v) = c(v,w) / c(v·)` from the corpus
    * itself (every scored bigram was counted, so no smoothing is needed —
    * this is the self-scoring quality-filter form). Sharper than the
    * unigram score at flagging locally-incoherent text (random word salad
    * has plausible unigrams but improbable transitions). Docs with < 2
    * tokens have no transitions and are absent. Same scale shape as the
    * unigram: per-(doc, bigram) multiplicities first (distinct pairs, not
    * corpus positions, cross the shuffle), bigram and context totals
    * aggregate from that already-collapsed frame.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(idCol).as("id"),
        TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bg = t.select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
      .select(col("id"), col("p.l").as("l"), col("p.r").as("r"))
    val m = Materialize.view( // shared by clr + the scoring join (see surprisal)
      bg.groupBy("id", "l", "r").agg(count(lit(1)).cast("double").as("k")))
    val clr = Materialize.view( // shared by cl + the scoring join
      m.groupBy("l", "r").agg(sum(col("k")).as("clr")))
    val cl = clr.groupBy("l").agg(sum(col("clr")).as("cltot"))
    m.join(clr, Seq("l", "r")).join(cl, Seq("l"))
      .groupBy("id")
      .agg(round(sum(col("k") * -log(col("clr") / col("cltot"))) / sum(col("k")), 6)
        .as("bigram_surprisal"))
  }

  /** Interpolated Kneser–Ney bigram surprisal — the smoothing the KenLM
    * scorers behind CCNet-style filtering actually use, reduced to its
    * bigram form:
    * {{{
    * P_KN(w|v) = max(c(v,w) − d, 0)/c(v·) + λ(v)·P_cont(w)
    * λ(v)      = d · N1+(v·) / c(v·)        (mass discounted from v)
    * P_cont(w) = N1+(·w) / |bigram types|   (continuation probability)
    * }}}
    * Versus the MLE form (`bigramSurprisal`), KN punishes transitions into
    * words that only ever follow few contexts (the "San Francisco" effect:
    * "francisco" is frequent but not versatile) — a materially better
    * garbage detector on natural text. Doc score = multiplicity-weighted
    * mean `−ln P_KN` over its transitions, rounded to 6.
    *
    * Same scale shape as `bigramSurprisal`: every statistic (bigram
    * counts, context totals, follower/predecessor type counts, the 1-row
    * type total) aggregates from the already-collapsed per-(doc, bigram)
    * multiplicity frame; scored bigrams all exist in the corpus, so the
    * interpolated probability is always positive.
    */
  def kneserNeySurprisal(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val t = docs.select(col(idCol).as("id"),
        TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bg = t.select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
      .select(col("id"), col("p.l").as("l"), col("p.r").as("r"))
    val m = Materialize.view( // shared by clr + the scoring join (see surprisal)
      bg.groupBy("id", "l", "r").agg(count(lit(1)).cast("double").as("k")))
    val clr = Materialize.view( // shared by cl/cont/tot + the scoring join
      m.groupBy("l", "r").agg(sum(col("k")).as("clr")))
    val cl = clr.groupBy("l").agg(sum(col("clr")).as("cltot"),
      count(lit(1)).cast("double").as("nfollow"))
    val cont = clr.groupBy("r").agg(count(lit(1)).cast("double").as("nprec"))
    val tot = clr.agg(count(lit(1)).cast("double").as("ntypes"))
    val d = lit(discount)
    val pkn = greatest(col("clr") - d, lit(0.0)) / col("cltot") +
      (d * col("nfollow") / col("cltot")) * (col("nprec") / col("ntypes"))
    m.join(clr, Seq("l", "r")).join(cl, Seq("l")).join(cont, Seq("r"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(round(sum(col("k") * -log(pkn)) / sum(col("k")), 6)
        .as("kn_surprisal"))
  }

  /** Interpolated Kneser–Ney TRIGRAM surprisal — the order the CCNet-style
    * perplexity filter actually ships (order ≥ 3 separates word salad from
    * locally-coherent text far better than the bigram, q152). Standard
    * three-level interpolation with one absolute discount D per level:
    *
    *   p₃(w|u,v) = max(c(uvw)−D,0)/c(uv·) + D·N₁₊(uv·)/c(uv·) · p₂(w|v)
    *   p₂(w|v)   = max(N₁₊(·vw)−D,0)/N₁₊(·v·)
    *               + D·N₁₊(v·)/N₁₊(·v·) · p₁(w)
    *   p₁(w)     = N₁₊(·w) / N₁₊(··)
    *
    * where the lower levels use CONTINUATION (type) counts from the
    * trigram type relation, per Kneser–Ney: N₁₊(·vw) = distinct u
    * preceding vw, N₁₊(·v·) = distinct (u,w) around v, N₁₊(v·) =
    * distinct w continuing v, N₁₊(·w)/N₁₊(··) over bigram types. Every
    * scored trigram occurs in the corpus, so c(uv·) > 0 and every
    * denominator is positive; interpolation keeps p₃ > 0.
    *
    * Scale shape, same discipline as the bigram form: ONE per-(doc,
    * trigram) multiplicity collapse crosses the shuffle with corpus
    * positions; every LM statistic (5 type-level frames + the 1-row type
    * total) aggregates from the trigram TYPE relation, which is
    * vocabulary-cubed-bounded and in practice far smaller than the
    * corpus; the scoring join shuffles type-keyed rows only. Docs with
    * < 3 tokens have no trigrams and are absent.
    */
  def kneserNeyTrigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val t = docs.select(col(idCol).as("id"),
        TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))).as("toks"))
      .filter(size(col("toks")) >= 3)
    val tg = t.select(col("id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => struct(
          element_at(col("toks"), i + 1).as("u"),
          element_at(col("toks"), i + 2).as("v"),
          element_at(col("toks"), i + 3).as("w")))).as("g"))
      .select(col("id"), col("g.u").as("u"), col("g.v").as("v"), col("g.w").as("w"))
    val m = Materialize.view( // shared by c3 + the scoring join (see surprisal)
      tg.groupBy("id", "u", "v", "w").agg(count(lit(1)).cast("double").as("k")))
    val c3 = Materialize.view( // shared by cuv/bt/nv + the scoring join
      m.groupBy("u", "v", "w").agg(sum(col("k")).as("c3")))
    val cuv = c3.groupBy("u", "v").agg(sum(col("c3")).as("cuvtot"),
      count(lit(1)).cast("double").as("nfollow3"))
    val bt = Materialize.view( // shared by mt/n1w/tot + the scoring join
      c3.groupBy("v", "w").agg(count(lit(1)).cast("double").as("contvw")))
    val nv = c3.groupBy("v").agg(count(lit(1)).cast("double").as("nmid"))
    val mt = bt.groupBy("v").agg(count(lit(1)).cast("double").as("nfollow2"))
    val n1w = bt.groupBy("w").agg(count(lit(1)).cast("double").as("nprec"))
    val tot = bt.agg(count(lit(1)).cast("double").as("ntypes"))
    val d = lit(discount)
    val p1 = col("nprec") / col("ntypes")
    val p2 = greatest(col("contvw") - d, lit(0.0)) / col("nmid") +
      (d * col("nfollow2") / col("nmid")) * p1
    val p3 = greatest(col("c3") - d, lit(0.0)) / col("cuvtot") +
      (d * col("nfollow3") / col("cuvtot")) * p2
    m.join(c3, Seq("u", "v", "w")).join(cuv, Seq("u", "v")).join(bt, Seq("v", "w"))
      .join(nv, Seq("v")).join(mt, Seq("v")).join(n1w, Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(round(sum(col("k") * -log(p3)) / sum(col("k")), 6)
        .as("kn3_surprisal"))
  }
}
