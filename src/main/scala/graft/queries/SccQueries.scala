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
    },

    // Bow-tie decomposition on a directional star: odd groups point INTO
    // group 0 (the largest-by-tie SCC — the core), even groups are pointed
    // AT from node 0. Ground truth is closed-form; the engine must run the
    // full scc + two reachability fixpoints. Size-4 groups (diameter 2
    // with the +2 chord) keep every fixpoint depth minimal — the query's
    // cost is round count, not data volume (24.5 s -> ~12 s vs size 8).
    GQuery(
      "q325_bowtie",
      """SELECT doc_id,
        |       CASE WHEN doc_id < 4 THEN 'core'
        |            WHEN (doc_id // 4) % 2 = 1 THEN 'in'
        |            ELSE 'out' END AS cls
        |FROM documents""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val m = expr("(doc_id div 4) * 4")
      val gidx = expr("doc_id div 4")
      val size = least(lit(4L), lit(docs.count()) - m)
      val cyc = docs.select(col("doc_id").as("src"),
        (m + pmod(col("doc_id") - m + 1, size)).as("dst"))
      val chord = docs.select(col("doc_id").as("src"),
        (m + pmod(col("doc_id") - m + 2, size)).as("dst"))
      val intoCore = docs.filter(col("doc_id") === m && gidx % 2 === 1)
        .select(col("doc_id").as("src"), lit(0L).as("dst"))
      val fromCore = docs.filter(col("doc_id") === m && gidx % 2 === 0 &&
          col("doc_id") > 0)
        .select(lit(0L).as("src"), col("doc_id").as("dst"))
      val edges = cyc.unionByName(chord).unionByName(intoCore)
        .unionByName(fromCore).filter(col("src") =!= col("dst"))
      Scc.bowTie(edges)
        .select(col("id").as("doc_id"), col("cls"))
    })
}
