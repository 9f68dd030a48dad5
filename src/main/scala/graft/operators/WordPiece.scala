package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece greedy segmentation (Wu et al. 2016 / BERT's tokenizer):
  * longest-match-first from the word start, continuation pieces carry the
  * `##` prefix, and a word with an unmatchable position collapses to a
  * single `[UNK]` — completing the tokenizer family next to BPE
  * (merge-ranked) and the unigram model (Viterbi-optimal): three
  * segmenters, three selection rules, one corpus.
  *
  * Scale shape (the [[UnigramSeg]] discipline): the vocabulary is
  * bounded — every single code point plus the ≥ minCount pieces of
  * length ≤ maxLen, at most |alphabet|^maxLen entries — so it broadcasts,
  * and the greedy walk runs map-side over DISTINCT words only (token
  * frequency never multiplies the work; join results back to occurrences
  * when needed). No shuffle beyond the distinct and the piece-count
  * aggregates.
  *
  * Engine-neutral determinism: greedy is a single-successor walk — at
  * position p take the LONGEST vocab piece that matches (position 1 uses
  * initial pieces, later positions continuation pieces; single code
  * points from the corpus are always in vocab) — so an SQL oracle
  * (q209) materializes the per-(word, pos) choice relation and follows
  * it with a recursive CTE, no argmax inside the recursion.
  */
object WordPiece {

  /** Bounded vocabulary: `init` holds word-initial piece contents,
    * `cont` holds continuation contents (stored WITHOUT the ## marker).
    */
  final case class WpVocab(init: Set[String], cont: Set[String])

  /** Corpus-derived vocabulary over code points: all single characters
    * (both positions — so corpus words never hit [UNK]) plus every
    * length-2..maxLen piece whose count over DISTINCT word types at that
    * position class reaches `minCount`.
    */
  def vocabFromCorpus(docs: DataFrame, textCol: String, maxLen: Int = 2,
      minCount: Long = 2L): WpVocab = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    // distributed piece counting: distinct words stay on the cluster (a
    // real corpus has 10^8+ types — only the BOUNDED piece table, at most
    // 2·|alphabet|^maxLen rows, ever reaches the driver). Per word type:
    // every (position-class, substring ≤ maxLen); single chars pass with
    // count ≥ 1 (the always-available fallback), longer pieces need
    // minCount.
    val pieces = docs
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "").distinct().as[String]
      .flatMap { w =>
        val cps = w.codePoints().toArray
        val out = Seq.newBuilder[(Boolean, String)]
        var p = 0
        while (p < cps.length) {
          var l = 1
          while (l <= maxLen && p + l <= cps.length) {
            out += ((p == 0, new String(cps, p, l)))
            l += 1
          }
          p += 1
        }
        out.result()
      }
      .toDF("is_init", "piece")
      .groupBy("is_init", "piece").agg(count(lit(1)).as("c"))
      .filter(length(col("piece")) === 1 || col("c") >= minCount)
      .select("is_init", "piece")
      .collect()
    WpVocab(
      pieces.collect { case r if r.getBoolean(0) => r.getString(1) }.toSet,
      pieces.collect { case r if !r.getBoolean(0) => r.getString(1) }.toSet)
  }

  /** Greedy-segment every DISTINCT word of the corpus: one output row per
    * piece, `(word, idx, piece)` with continuation pieces ##-prefixed; an
    * unmatchable position collapses the word to `(word, 0, "[UNK]")`.
    */
  def encodeWords(docs: DataFrame, textCol: String, vocab: WpVocab,
      maxLen: Int = 2): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    docs.select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "").distinct().as[String]
      .flatMap { w =>
        val v = bc.value
        val cps = w.codePoints().toArray
        val n = cps.length
        val out = Seq.newBuilder[(String, Int, String)]
        var p = 0
        var idx = 0
        var unk = false
        while (p < n && !unk) {
          var l = math.min(maxLen, n - p)
          var hit = -1
          while (l >= 1 && hit < 0) {
            val s = new String(cps, p, l)
            val ok = if (p == 0) v.init.contains(s) else v.cont.contains(s)
            if (ok) hit = l else l -= 1
          }
          if (hit < 0) unk = true
          else {
            val s = new String(cps, p, hit)
            out += ((w, idx, if (p == 0) s else "##" + s))
            idx += 1
            p += hit
          }
        }
        if (unk) Iterator((w, 0, "[UNK]"))
        else out.result().iterator
      }
      .toDF("word", "idx", "piece")
  }
}
