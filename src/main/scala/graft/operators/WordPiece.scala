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
    val words = docs
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "").distinct().as[String].collect()
    val initCounts = scala.collection.mutable.HashMap.empty[String, Long]
    val contCounts = scala.collection.mutable.HashMap.empty[String, Long]
    val init = scala.collection.mutable.HashSet.empty[String]
    val cont = scala.collection.mutable.HashSet.empty[String]
    words.foreach { w =>
      val cps = w.codePoints().toArray
      val n = cps.length
      var p = 0
      while (p < n) {
        var l = 1
        while (l <= maxLen && p + l <= n) {
          val s = new String(cps, p, l)
          if (l == 1) { if (p == 0) init += s else cont += s }
          else if (p == 0) initCounts.update(s, initCounts.getOrElse(s, 0L) + 1L)
          else contCounts.update(s, contCounts.getOrElse(s, 0L) + 1L)
          l += 1
        }
        p += 1
      }
    }
    WpVocab(
      init.toSet ++ initCounts.collect { case (s, c) if c >= minCount => s },
      cont.toSet ++ contCounts.collect { case (s, c) if c >= minCount => s })
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
