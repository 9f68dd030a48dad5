package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Viterbi segmentation under a unigram piece LM — the inference step of a
  * SentencePiece-style tokenizer (Kudo 2018): each word takes the
  * segmentation maximizing the summed piece log-probabilities. The piece
  * inventory here is every 1- and 2-character substring of the corpus
  * vocabulary (occurrence-weighted by word frequency), scored
  * `ln(cnt / total)` under one shared distribution — single characters
  * guarantee every word segments, multi-char pieces make the DP
  * non-trivial.
  *
  * Scale shape: piece counting is ONE (piece)-keyed aggregate over the
  * vocabulary relation (words × their ≤2·len substrings — the RELATION,
  * not the corpus: multiplicities ride the `cnt` column). The inventory
  * is bounded by |alphabet|² + |alphabet| regardless of corpus size, so
  * it broadcasts by construction, and the per-word DP is a map-side
  * kernel over distinct words. The corpus text itself is touched once
  * (word counting).
  *
  * Determinism: every candidate path score is a LEFT-TO-RIGHT sum of the
  * same doubles in both engines, so `max` over candidates is bit-stable —
  * the DP emits only the optimal SCORE (unique even when multiple
  * segmentations attain it), never an arbitrary argmax.
  */
object UnigramSeg {

  /** (piece, score) for every 1-/2-char substring of the weighted
    * vocabulary: score = ln(cnt / total) with `total` summed over the
    * whole inventory (one distribution, chars and bigrams together).
    */
  def pieceScores(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 2): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val wc = Bpe.wordCounts(docs, textCol)
    // CASE guard, not greatest(): Spark's sequence(1, 0) is the DESCENDING
    // [1, 0], which would double-count a word shorter than the piece length
    val pieces = wc.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen), l ->
           |  CASE WHEN char_length(word) >= l THEN
           |    transform(sequence(1, char_length(word) - l + 1),
           |              i -> substring(word, i, l))
           |  ELSE array() END))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("pcnt"))
    val total = pieces.agg(sum(col("pcnt")).as("t"))
    pieces.crossJoin(broadcast(total))
      .select(col("piece"),
        log(col("pcnt").cast("double") / col("t")).as("score"))
  }

  /** Optimal (max total piece score) segmentation score per DISTINCT
    * word: (word, best_score rounded to 6). The DP is exact Viterbi —
    * `best(i) = max over piece lengths l: best(i-l) + score(word[i-l, i))`
    * — against the broadcast inventory; [[UnigramSegSpec]] and the q176
    * oracle both pin it to exhaustive path enumeration.
    */
  def wordBestScores(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scores: Map[String, Double] = pieceScores(docs, textCol, maxPieceLen)
      .as[(String, Double)].collect().toMap
    val bc = spark.sparkContext.broadcast(scores)
    val maxL = maxPieceLen
    Bpe.wordCounts(docs, textCol).select(col("word")).as[String]
      .map { word =>
        val s = bc.value
        // DP over CODE POINTS, matching pieceScores' SQL char_length/substring
        // semantics — a supplementary-plane char is one piece unit, not two.
        val cps = word.codePoints().toArray
        val n = cps.length
        val best = new Array[Double](n + 1)
        var i = 1
        while (i <= n) {
          var b = Double.NegativeInfinity
          var l = 1
          while (l <= maxL && l <= i) {
            s.get(new String(cps, i - l, l)) match {
              case Some(ps) =>
                val cand = best(i - l) + ps
                if (cand > b) b = cand
              case None =>
            }
            l += 1
          }
          best(i) = b
          i += 1
        }
        (word, math.rint(best(n) * 1e6) / 1e6)
      }
      .toDF("word", "best_score")
  }

  /** ONE hard-EM (Viterbi-training) iteration of the unigram model (the
    * SentencePiece training loop's E/M step pair, Viterbi variant):
    * E-step — segment every vocabulary word with the CURRENT inventory
    * and count the winning pieces (occurrence-weighted); M-step —
    * re-normalize: `new_score = round6(ln(em_cnt / Σ em_cnt))`. Pieces
    * no winning path uses drop out — the pruning that concentrates
    * probability mass, which is the point of the iteration.
    *
    * Engine-neutral path selection: piece scores QUANTIZE to 6 decimals
    * before the DP, so every path score is the identical left-to-right
    * double sum in any engine, and exact ties break to the
    * lexicographically smallest piece-LENGTH sequence (1 before 2 at
    * the earliest divergence — prefer the shorter piece first; lengths
    * compare as INTEGERS, so length >= 10 pieces order correctly). Both
    * rules are exchange-safe for the DP (equal-sum length sequences are
    * never prefixes of each other), so q224's oracle replays the
    * selection by exhaustive path enumeration, tie rule included.
    *
    * Scale shape: [[pieceScores]]' bounded inventory broadcasts; the DP
    * runs map-side over DISTINCT words; counts are one piece-keyed
    * aggregate over (winning pieces × word multiplicity).
    */
  def hardEmIteration(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scores: Map[String, Double] =
      pieceScores(docs, textCol, maxPieceLen)
        .select(col("piece"), round(col("score"), 6).as("score"))
        .as[(String, Double)].collect().toMap
    emStep(Bpe.wordCounts(docs, textCol), scores, maxPieceLen)
  }

  /** Iterated hard EM: run `iters` E/M pairs, each re-segmenting under
    * the PREVIOUS step's re-normalized scores. The Viterbi objective
    * (Σ_words cnt · best-path score) is non-decreasing across iterations
    * by the usual hard-EM argument — the E-step picks the best paths
    * under the current scores, the M-step maximizes the same objective
    * for those fixed paths ([[UnigramSegSpec]] asserts the monotonicity
    * on the corpus). The inventory only ever SHRINKS, so each iteration
    * costs no more than the last; the corpus is touched once (word
    * counts), every iteration runs on the vocabulary relation.
    */
  def hardEm(docs: DataFrame, textCol: String, iters: Int,
      maxPieceLen: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = Bpe.wordCounts(docs, textCol).cache()
    var scores: Map[String, Double] =
      pieceScores(docs, textCol, maxPieceLen)
        .select(col("piece"), round(col("score"), 6).as("score"))
        .as[(String, Double)].collect().toMap
    var out: DataFrame = null
    var it = 0
    while (it < iters) {
      out = emStep(wc, scores, maxPieceLen)
      scores = out.select(col("piece"), col("new_score"))
        .as[(String, Double)].collect().toMap
      it += 1
    }
    wc.unpersist()
    out
  }

  /** One E/M pair against an explicit quantized score table. */
  private def emStep(wc: DataFrame, scores: Map[String, Double],
      maxPieceLen: Int): DataFrame = {
    val spark = wc.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(scores)
    val maxL = maxPieceLen
    val used = wc.as[(String, Long)]
      .flatMap { case (word, cnt) =>
        val s = bc.value
        val cps = word.codePoints().toArray
        val n = cps.length
        val best = new Array[Double](n + 1)
        // the winning path at each prefix is its piece-LENGTH sequence,
        // held as a Vector[Int] and compared element-wise lexicographically
        // (a digit-string encoding would collide distinct segmentations
        // once pieces reach length 10: "2"+"1" vs "21")
        val path = new Array[Vector[Int]](n + 1)
        path(0) = Vector.empty
        // lexicographic over length sequences; equal-sum sequences are
        // never prefixes of one another, so prefix order never decides
        def lexLt(a: Vector[Int], b: Vector[Int]): Boolean = {
          var i = 0
          val m = math.min(a.length, b.length)
          while (i < m) {
            if (a(i) != b(i)) return a(i) < b(i)
            i += 1
          }
          a.length < b.length
        }
        var i = 1
        while (i <= n) {
          var b = Double.NegativeInfinity
          var bp: Vector[Int] = null
          var l = 1
          while (l <= maxL && l <= i) {
            // skip candidates extending an UNREACHABLE prefix (no path,
            // score -Inf): they can never win at n, and extending a null
            // path is meaningless
            if (path(i - l) != null) s.get(new String(cps, i - l, l)) match {
              case Some(ps) =>
                val cand = best(i - l) + ps
                val candPath = path(i - l) :+ l
                if (cand > b || (cand == b && (bp == null || lexLt(candPath, bp)))) {
                  b = cand; bp = candPath
                }
              case None =>
            }
            l += 1
          }
          best(i) = b; path(i) = bp
          i += 1
        }
        // every word stays segmentable: its own previous winning path's
        // pieces all survived the M-step (inductive invariant)
        require(n == 0 || path(n) != null,
          s"hard-EM: word '$word' unsegmentable under the current inventory")
        // walk the winning length sequence back into pieces
        val out = Seq.newBuilder[(String, Long)]
        var p = 0
        path(n).foreach { l =>
          out += ((new String(cps, p, l), cnt))
          p += l
        }
        out.result()
      }
      .toDF("piece", "cnt")
    val counts = used.groupBy("piece").agg(sum("cnt").as("em_cnt"))
    val total = counts.agg(sum("em_cnt").as("t"))
    counts.crossJoin(broadcast(total))
      .select(col("piece"), col("em_cnt"),
        round(log(col("em_cnt").cast("double") / col("t")), 6).as("new_score"))
  }
}
