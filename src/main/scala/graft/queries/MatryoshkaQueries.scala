package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Matryoshka

/** Matryoshka truncation sweep: recall@10 of prefix-dimension exact
  * search vs the full-64-dim truth on the q20 query/base split. The
  * oracle recomputes each truncated ranking with DuckDB list slicing and
  * the (dist, nid) tiebreak, then the per-query hit counts and the
  * rounded mean — d = 64 must come out exactly 1.0 (same ranking, same
  * tiebreak), which pins the whole chain.
  */
object MatryoshkaQueries {

  private val dims = Seq(8, 16, 32, 64)

  private def truncRank(d: Int): String =
    s"""r$d AS MATERIALIZED (
       |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
       |  FROM (
       |    SELECT q.qid, b.vec_id AS nid,
       |           1.0 - list_sum(list_transform(range(1, $d+1),
       |                     i -> q.qe[i]::DOUBLE * b.embedding[i]::DOUBLE))
       |               / (sqrt(list_sum(list_transform(q.qe[1:$d], x -> x::DOUBLE*x::DOUBLE))) *
       |                  sqrt(list_sum(list_transform(b.embedding[1:$d], x -> x::DOUBLE*x::DOUBLE)))) AS dist
       |    FROM q CROSS JOIN b)),
       |h$d AS (
       |  SELECT t.qid, count(*) AS hits
       |  FROM (SELECT qid, nid FROM rt WHERE rank <= 10) t
       |  JOIN (SELECT qid, nid FROM r$d WHERE rank <= 10) p
       |    ON p.qid = t.qid AND p.nid = t.nid
       |  GROUP BY t.qid),
       |a$d AS (
       |  SELECT $d AS dims, round(avg(coalesce(h.hits, 0)::DOUBLE / 10), 4) AS avg_recall
       |  FROM (SELECT DISTINCT qid FROM rt) qs LEFT JOIN h$d h ON h.qid = qs.qid)""".stripMargin

  def all: Seq[GQuery] = Seq(

    GQuery(
      "q318_matryoshka_recall",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
         |           FROM embeddings WHERE vec_id < 20),
         |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20),
         |rt AS MATERIALIZED (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
         |  FROM (
         |    SELECT q.qid, b.vec_id AS nid,
         |           1.0 - list_sum(list_transform(range(1, len(q.qe)+1),
         |                     i -> q.qe[i]::DOUBLE * b.embedding[i]::DOUBLE))
         |               / (sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE*x::DOUBLE))) *
         |                  sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE*x::DOUBLE)))) AS dist
         |    FROM q CROSS JOIN b)),
         |${dims.map(truncRank).mkString(",\n")}
         |${dims.map(d => s"SELECT dims, avg_recall FROM a$d").mkString("\nUNION ALL ")}""".stripMargin) {
      (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Matryoshka.recallCurve(emb.filter(col("vec_id") < 20),
        emb.filter(col("vec_id") >= 20), dims, k = 10)
    })
}
