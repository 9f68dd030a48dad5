package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Scc

/** SCC query over a deterministic component fixture whose ground truth
  * is CLOSED-FORM: doc ids partition into groups of 8; each group is a
  * directed cycle with +2 chords (one SCC, min = the group base), and
  * every group's base points at node 0 (a star condensation). The cross
  * edges never merge components, so scc(v) = (v ÷ 8)·8 by construction —
  * the oracle states the expected result while the engine must actually
  * peel: wave 1 can only assign group 0 (every other group's backward
  * min-label reaches 0), wave 2 the rest. SccSpec carries the
  * general-graph evidence (exact Tarjan parity on random digraphs).
  */
object SccQueries {

  def all: Seq[GQuery] = Seq(

    GQuery(
      "q319_scc",
      """SELECT doc_id, (doc_id // 8) * 8 AS scc FROM documents""") { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val m = expr("(doc_id div 8) * 8")
      val size = least(lit(8L),
        lit(docs.count()) - m)
      val cyc = docs.select(col("doc_id").as("src"),
        (m + pmod(col("doc_id") - m + 1, size)).as("dst"))
      val chord = docs.select(col("doc_id").as("src"),
        (m + pmod(col("doc_id") - m + 2, size)).as("dst"))
      val cross = docs.filter(col("doc_id") === m && col("doc_id") > 0)
        .select(col("doc_id").as("src"), lit(0L).as("dst"))
      val edges = cyc.unionByName(chord).unionByName(cross)
      Scc.scc(edges)
        .select(col("id").as("doc_id"), col("scc"))
    })
}
