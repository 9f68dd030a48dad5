package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Wand

/** Block-max WAND queries: the pruned exact-top-k read path (q278, whose
  * oracle is deliberately the EXHAUSTIVE q120 formulation — the pruning's
  * whole claim is that it changes nothing) and the pruning-measurement
  * card (q279, whose oracle replays block maxima, seed threshold and the
  * survivor rule from first principles).
  *
  * Geometry: blockSize=64 docs/block, seedBlocks=4, the q120 query
  * (vector, hash, spark) at k=20.
  */
object WandQueries {

  private val terms = "('vector', 'hash', 'spark')"

  /** Shared oracle CTE text: impact postings with block ids. */
  private val impactSql =
    s"""toks AS (SELECT doc_id,
       |                list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
       |         FROM documents),
       |lens AS (SELECT doc_id, len(toks)::DOUBLE AS len FROM toks),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(len) AS avg_len FROM lens),
       |tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf
       |       FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
       |       WHERE tok IN $terms GROUP BY doc_id, tok),
       |dfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
       |imp AS (SELECT doc_id, tok, (doc_id // 64) AS blk,
       |               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |                 * tf * (1.2 + 1.0)
       |                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avg_len)) AS impact
       |        FROM tf JOIN dfreq USING (tok) JOIN lens USING (doc_id) CROSS JOIN stats),
       |bm AS (SELECT tok, blk, max(impact) AS bm FROM imp GROUP BY tok, blk),
       |ub AS (SELECT blk, round(sum(bm), 6) AS ub FROM bm GROUP BY blk),
       |seed AS (SELECT blk FROM ub ORDER BY ub DESC, blk LIMIT 4),
       |sscore AS (SELECT doc_id, round(sum(impact), 6) AS score
       |           FROM imp JOIN seed USING (blk) GROUP BY doc_id),
       |topseed AS (SELECT score FROM sscore ORDER BY score DESC, doc_id LIMIT 20),
       |theta AS (SELECT CASE WHEN count(*) = 20 THEN min(score)
       |                      ELSE CAST('-infinity' AS DOUBLE) END AS theta
       |          FROM topseed),
       |surv AS (SELECT blk FROM ub CROSS JOIN theta WHERE ub >= theta - 1e-6)""".stripMargin

  def all: Seq[GQuery] = Seq(

    // Pruned exact top-20 == exhaustive BM25: the oracle is the SAME SQL
    // q120 uses (no pruning anywhere in it) — a green row IS the proof
    // that block-max skipping returned the exhaustive answer.
    GQuery(
      "q278_wand_topk",
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |              FROM documents),
        |lens AS (SELECT doc_id, len(toks)::DOUBLE AS len FROM toks),
        |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(len) AS avg_len FROM lens),
        |tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf
        |       FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
        |       WHERE tok IN ('vector', 'hash', 'spark') GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
        |s AS (SELECT doc_id,
        |             round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |                       * tf * (1.2 + 1.0)
        |                       / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avg_len))), 6) AS score
        |      FROM tf JOIN dfreq USING (tok) JOIN lens USING (doc_id) CROSS JOIN stats
        |      GROUP BY doc_id)
        |SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) {
      (s, dir) =>
      val (postings, blockMax) =
        Wand.impactIndex(Tables.documents(s, dir), "doc_id", "text", blockSize = 64L)
      Wand.topK(postings, blockMax, Seq("vector", "hash", "spark"), k = 20,
          seedBlocks = 4)
        .select(col("id").as("doc_id"), col("score"))
    },

    // The measured saving: blocks/postings scored vs skipped under the
    // q278 pruning. The oracle replays the whole pruning pipeline —
    // block maxima, seed blocks, the k-th-seed-score threshold and the
    // survivor rule — so the card's every number is recomputed from
    // first principles.
    GQuery(
      "q279_wand_pruning_card",
      s"""WITH $impactSql,
         |tot AS (SELECT count(*) AS postings_total FROM imp),
         |sc AS (SELECT count(*) AS postings_scored FROM imp JOIN surv USING (blk)),
         |bt AS (SELECT count(*) AS blocks_total FROM ub),
         |bsc AS (SELECT count(*) AS blocks_scored FROM surv)
         |SELECT blocks_total, blocks_scored, postings_total, postings_scored,
         |       round(1.0 - postings_scored::DOUBLE / postings_total, 6) AS skipped_frac
         |FROM bt, bsc, tot, sc""".stripMargin) { (s, dir) =>
      val (postings, blockMax) =
        Wand.impactIndex(Tables.documents(s, dir), "doc_id", "text", blockSize = 64L)
      Wand.pruningCard(postings, blockMax, Seq("vector", "hash", "spark"), k = 20,
        seedBlocks = 4)
    },

    // Exact positional phrase match ("slow hash batch", a trigram the
    // corpus repeats within one doc): term-pruned postings aligned on
    // (id, pos - k) — the oracle replays positions and the 3-way
    // intersection from first principles. The L-way join carries only
    // (long, long) keys; no text shuffles.
    GQuery(
      "q289_phrase_search",
      """WITH toks AS (SELECT doc_id,
        |                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
        |         FROM documents),
        |p AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |      FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
        |m AS (SELECT a.doc_id, a.pos AS start
        |      FROM p a
        |      JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |      JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |      WHERE a.tok = 'slow' AND b.tok = 'hash' AND c.tok = 'batch')
        |SELECT doc_id AS id, count(*) AS n_occurrences, min(start) AS first_pos
        |FROM m GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val postings = graft.operators.PhraseSearch
        .positionalPostings(Tables.documents(s, dir), "doc_id", "text")
      graft.operators.PhraseSearch
        .phraseOccurrences(postings, Seq("slow", "hash", "batch"))
        .select(col("id"), col("n_occurrences"),
          col("first_pos").cast("long").as("first_pos"))
    },

    // Anchored proximity (slop) search: every 'vector' occurrence that
    // has a 'spark' witness AND a 'query' witness within 5 tokens. The
    // oracle's EXISTS-per-term is exactly the operator's fold of
    // (range-join, distinct-anchor) steps.
    GQuery(
      "q290_proximity_search",
      """WITH toks AS (SELECT doc_id,
        |                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
        |         FROM documents),
        |p AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |      FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
        |m AS (SELECT a.doc_id, a.pos
        |      FROM p a
        |      WHERE a.tok = 'vector'
        |        AND EXISTS (SELECT 1 FROM p b WHERE b.doc_id = a.doc_id
        |                    AND b.tok = 'spark' AND abs(b.pos - a.pos) <= 5)
        |        AND EXISTS (SELECT 1 FROM p c WHERE c.doc_id = a.doc_id
        |                    AND c.tok = 'query' AND abs(c.pos - a.pos) <= 5))
        |SELECT doc_id AS id, count(*) AS n_anchors FROM m GROUP BY doc_id""".stripMargin) {
      (s, dir) =>
      val postings = graft.operators.PhraseSearch
        .positionalPostings(Tables.documents(s, dir), "doc_id", "text")
      graft.operators.PhraseSearch
        .proximityDocs(postings, Seq("vector", "spark", "query"), window = 5)
    },
  )
}
