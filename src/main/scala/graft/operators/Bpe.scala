package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer training — the merge-table learner behind
  * every BPE/WordPiece-family vocabulary. Classic algorithm (Sennrich et
  * al. 2016): start from character segmentations, repeatedly merge the
  * globally most frequent adjacent symbol pair.
  *
  * Scale shape: after ONE corpus pass collapses the text to word counts,
  * every iteration runs on the VOCABULARY relation (distinct words ×
  * current segmentation), never the corpus — the same collapse the
  * standard trainers use, except the vocabulary stays a distributed
  * DataFrame instead of a driver hash map, so a 100TB corpus's
  * billion-word vocabulary still fits the model. Each merge iteration is
  * one pair-explode + sum aggregate (map-side combined, pair-keyed) and a
  * TakeOrdered(1); the segmentation update is a typed per-row kernel (no
  * shuffle). The vocabulary is `localCheckpoint`ed each round — caching is
  * NOT enough: a cache leaves the logical plan chained through every
  * previous round, and Catalyst re-analysis + codegen over that growing
  * plan turn superlinear (measured: 10 merges 25 s, 16 merges 79 s, 20
  * merges OOMs an 8 GB driver); the checkpoint truncates each round's
  * plan to the materialized RDD, making per-merge cost flat. Local
  * checkpoints trade executor-loss recovery for speed — a cluster run
  * that must survive preemption should set a reliable checkpoint dir and
  * swap `localCheckpoint` for `checkpoint` (same contract).
  *
  * Determinism: pair ties break on (count desc, left asc, right asc) in
  * binary string order — byte-replayable by any engine. Merge application
  * is left-to-right non-overlapping (greedy BPE): for the pair (a,a) on
  * "a a a" the result is "aa a". While every piece is still a single
  * character (i.e. for the FIRST merge only) this equals SQL
  * `replace(seg, 'a b', 'ab')` on the space-joined segmentation; once
  * pieces are multi-character a bare replace can match across a piece
  * boundary ('th e' -> 'the' for the merge (h,e)), so later merges must
  * be replayed piece-wise (the oracle folds the piece list with a
  * boundary-guarded `list_reduce`).
  */
object Bpe {

  /** (word, cnt) corpus word counts — the one corpus-wide pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(
        lower(coalesce(col(textCol), lit(""))))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right merge of adjacent (l, r) symbol pairs — the BPE
    * update rule. Exposed for the spec; engine-equal to `replace` on the
    * space-joined form because pieces never contain spaces.
    */
  private[operators] def applyMerge(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train `numMerges` merges; returns (rank, left, right, pair_cnt) plus
    * the final per-word segmentation. Stops early if no pair remains.
    */
  private def trainInternal(docs: DataFrame, textCol: String,
      numMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // initial segmentation: one symbol per character
    var vocab = wordCounts(docs, textCol)
      .select(col("word"), col("cnt"),
        expr("transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")
          .as("syms"))
      .as[(String, Long, Array[String])]
      .localCheckpoint() // eager: truncates lineage (see scaladoc)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = vocab.flatMap { case (_, cnt, syms) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), cnt))
        }
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          merges += ((rank, l, r, cnt))
          val prev = vocab
          vocab = vocab.map { case (w, c, syms) => (w, c, applyMerge(syms, l, r)) }
            .localCheckpoint() // eager; prev's RDD is released by the cleaner
          prev.unpersist(blocking = false)
          rank += 1
      }
    }
    (merges.toSeq,
      vocab.toDF("word", "cnt", "syms"))
  }

  /** The learned merge table: (merge_rank, merge_left, merge_right,
    * pair_cnt) — non-reserved names so any SQL engine can replay it.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, vocab) = trainInternal(docs, textCol, numMerges)
    vocab.unpersist(blocking = false)
    merges.map { case (rk, l, r, c) => (rk.toLong, l, r, c) }
      .toDF("merge_rank", "merge_left", "merge_right", "pair_cnt")
  }

  /** Per-document BPE token counts after `numMerges` trained merges: join
    * each document's words to the final vocabulary segmentation and sum
    * piece counts — the compression-ratio signal tokenizer ablations read
    * (corpus-trained, corpus-applied). One corpus shuffle (the word join);
    * the vocabulary side is the small one.
    */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame = {
    val (_, vocab) = trainInternal(docs, textCol, numMerges)
    val pieces = vocab.select(col("word"), size(col("syms")).cast("long").as("n_pieces"))
    // vocab stays cached while the caller executes the returned frame (the
    // encode join reads it); the bench harness clears cache between sweeps
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(coalesce(col(textCol), lit(""))))).as("word"))
      .join(pieces, "word")
      .groupBy("doc_id").agg(sum(col("n_pieces")).as("n_bpe_tokens"))
  }
}
