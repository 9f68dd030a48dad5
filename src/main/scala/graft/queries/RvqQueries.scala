package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Rvq

/** Residual-vector-quantization queries: the deterministic two-stage RVQ
  * (stage-0 codewords = rows vec_id<16 verbatim; stage-1 codewords = the
  * float-rounded residuals of rows 16..31 under stage 0) so the DuckDB
  * oracle replays codebook construction, the double-precision encode
  * chain, the ADC table decomposition and the per-stage error card from
  * first principles — the `Pq.subsetCodebooks` convention extended one
  * stage deeper. The learned KMeans path is RvqSpec's territory.
  *
  * Geometry at every sf: dim=64, two stages of 16 codewords (8 bits total).
  */
object RvqQueries {

  private val k0 = 16
  private val k1 = 16

  /** Shared oracle CTE text: both stage codebooks + the full encode chain
    * `assign(id, c0, e0, c1, e1)` (codes and the cumulative stage errors).
    * Every sum is a fixed-order list_sum over dims 1..64, so the double
    * arithmetic replays the Scala kernel bit-for-bit and ties break
    * identically (argmin → lower code).
    */
  private val rvqSql =
    s"""cb0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS code,
       |               embedding AS cw
       |        FROM embeddings WHERE vec_id < $k0),
       |b1d AS (SELECT e.vec_id, c.code,
       |               list_sum(list_transform(range(1, 65),
       |                 i -> (e.embedding[i]::DOUBLE - c.cw[i]::DOUBLE)
       |                    * (e.embedding[i]::DOUBLE - c.cw[i]::DOUBLE))) AS d
       |        FROM embeddings e, cb0 c
       |        WHERE e.vec_id >= $k0 AND e.vec_id < ${k0 + k1}),
       |b1a AS (SELECT vec_id, code FROM (
       |          SELECT vec_id, code,
       |                 row_number() OVER (PARTITION BY vec_id ORDER BY d, code) AS rn
       |          FROM b1d) WHERE rn = 1),
       |cb1 AS (SELECT (row_number() OVER (ORDER BY e.vec_id) - 1)::INT AS code,
       |               list_transform(range(1, 65),
       |                 i -> (e.embedding[i]::DOUBLE - c.cw[i]::DOUBLE)::FLOAT) AS cw
       |        FROM embeddings e
       |        JOIN b1a a ON a.vec_id = e.vec_id
       |        JOIN cb0 c ON c.code = a.code),
       |a0d AS (SELECT e.vec_id AS id, c.code,
       |               list_sum(list_transform(range(1, 65),
       |                 i -> (e.embedding[i]::DOUBLE - c.cw[i]::DOUBLE)
       |                    * (e.embedding[i]::DOUBLE - c.cw[i]::DOUBLE))) AS d
       |        FROM embeddings e, cb0 c),
       |a0 AS (SELECT id, code AS c0, d AS e0 FROM (
       |         SELECT id, code, d,
       |                row_number() OVER (PARTITION BY id ORDER BY d, code) AS rn
       |         FROM a0d) WHERE rn = 1),
       |r1 AS (SELECT a0.id, a0.c0, a0.e0,
       |              list_transform(range(1, 65),
       |                i -> e.embedding[i]::DOUBLE - c.cw[i]::DOUBLE) AS r
       |       FROM a0
       |       JOIN embeddings e ON e.vec_id = a0.id
       |       JOIN cb0 c ON c.code = a0.c0),
       |a1d AS (SELECT r1.id, r1.c0, r1.e0, c.code,
       |               list_sum(list_transform(range(1, 65),
       |                 i -> (r1.r[i] - c.cw[i]::DOUBLE)
       |                    * (r1.r[i] - c.cw[i]::DOUBLE))) AS d
       |        FROM r1, cb1 c),
       |assign AS (SELECT id, c0, e0, code AS c1, d AS e1 FROM (
       |             SELECT id, c0, e0, code, d,
       |                    row_number() OVER (PARTITION BY id ORDER BY d, code) AS rn
       |             FROM a1d) WHERE rn = 1)""".stripMargin

  private def codebooks(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val emb = Tables.embeddings(s, dir)
    Rvq.subsetStageCodebooks(emb.filter(col("vec_id") < k0 + k1), Seq(k0, k1))
  }

  def all: Seq[GQuery] = Seq(

    // RVQ encode: the two-stage greedy chain — stage-0 argmin on the raw
    // vector, stage-1 argmin on the double-precision residual — one row
    // per (vector, stage) so the compare is over plain ints.
    GQuery(
      "q281_rvq_encode",
      s"""WITH $rvqSql
         |SELECT id AS vec_id, 0 AS stage, c0 AS code FROM assign
         |UNION ALL
         |SELECT id AS vec_id, 1 AS stage, c1 AS code FROM assign""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Rvq.encode(emb, codebooks(s, dir))
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("stage", "code")))
    },

    // RVQ ADC top-5 for 20 queries: dist² decomposes into the broadcast
    // tables the scan actually uses — ‖q‖² − 2(q·C₀[c₀] + q·C₁[c₁]) +
    // (‖C₀[c₀]‖² + 2·C₀[c₀]·C₁[c₁] + ‖C₁[c₁]‖²) — so a green row proves
    // the table decomposition, not just the final ranking. Grouping
    // mirrors the kernel's evaluation order for bit-identical doubles.
    GQuery(
      "q282_rvq_adc_topk",
      s"""WITH $rvqSql,
         |qv AS (SELECT vec_id AS qid, embedding AS q,
         |              list_sum(list_transform(embedding,
         |                x -> x::DOUBLE * x::DOUBLE)) AS qq
         |       FROM embeddings WHERE vec_id >= 100 AND vec_id < 120),
         |qd0 AS (SELECT qv.qid, c.code,
         |               list_sum(list_transform(range(1, 65),
         |                 i -> qv.q[i]::DOUBLE * c.cw[i]::DOUBLE)) AS qd
         |        FROM qv, cb0 c),
         |qd1 AS (SELECT qv.qid, c.code,
         |               list_sum(list_transform(range(1, 65),
         |                 i -> qv.q[i]::DOUBLE * c.cw[i]::DOUBLE)) AS qd
         |        FROM qv, cb1 c),
         |s0 AS (SELECT code, list_sum(list_transform(cw,
         |                x -> x::DOUBLE * x::DOUBLE)) AS sd FROM cb0),
         |s1 AS (SELECT code, list_sum(list_transform(cw,
         |                x -> x::DOUBLE * x::DOUBLE)) AS sd FROM cb1),
         |x01 AS (SELECT a.code AS c0, b.code AS c1,
         |               list_sum(list_transform(range(1, 65),
         |                 i -> a.cw[i]::DOUBLE * b.cw[i]::DOUBLE)) AS xd
         |        FROM cb0 a, cb1 b),
         |adc AS (SELECT qv.qid, asg.id AS nid,
         |               sqrt(greatest(0.0,
         |                 qv.qq - 2.0 * (d0.qd + d1.qd)
         |                 + (s0.sd + 2.0 * x01.xd + s1.sd))) AS d
         |        FROM assign asg
         |        JOIN qv ON asg.id <> qv.qid
         |        JOIN qd0 d0 ON d0.qid = qv.qid AND d0.code = asg.c0
         |        JOIN qd1 d1 ON d1.qid = qv.qid AND d1.code = asg.c1
         |        JOIN s0 ON s0.code = asg.c0
         |        JOIN s1 ON s1.code = asg.c1
         |        JOIN x01 ON x01.c0 = asg.c0 AND x01.c1 = asg.c1)
         |SELECT qid AS query_id, nid AS neighbor_id, rank, round(d, 6) AS adc_dist
         |FROM (SELECT qid, nid, d,
         |             row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |      FROM adc)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cbs = codebooks(s, dir)
      val codes = Rvq.encode(emb, cbs)
      Rvq.adcSearch(emb.filter(col("vec_id") >= 100 && col("vec_id") < 120),
          codes, cbs, k = 5, excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("adc_dist"), 6).as("adc_dist"))
    },

    // Per-stage cumulative error card: corpus mean ‖residual‖² after each
    // stage — the monotone-descent curve that says what stage 2 buys over
    // stage 1 (plain VQ). The oracle averages the SAME per-row stage
    // errors the encode chain produced.
    GQuery(
      "q283_rvq_error_card",
      s"""WITH $rvqSql
         |SELECT 0 AS stage, round(avg(e0), 6) AS mse FROM assign
         |UNION ALL
         |SELECT 1 AS stage, round(avg(e1), 6) AS mse FROM assign""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Rvq.errorCard(emb, codebooks(s, dir))
        .select(col("stage"), round(col("mse"), 6).as("mse"))
    })
}
