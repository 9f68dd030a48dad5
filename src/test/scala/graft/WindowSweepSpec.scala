package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.util.QueryExecutionListener

/** The single-partition-window allowlist, machine-checked over EVERY
  * `SparkEntry.queries` entry (PLANS.md "Known single-partition windows"):
  * a `QueryExecutionListener` on a dedicated session records every
  * unpartitioned `WindowExec` any execution plans — including the
  * intermediate fixture-builder jobs a final-plan inspection would miss —
  * and the observed set must equal the documented allowlist EXACTLY.
  * A new global window in a core path fails this suite; an allowlist
  * entry that stops occurring fails it too (no rot).
  */
class WindowSweepSpec extends SparkSpec {

  /** query name -> why an unpartitioned window is acceptable there.
    * Every entry is input-bounded by construction (the window never sees
    * more rows than the documented cap), so the one-partition funnel is
    * a constant, not a scale hazard.
    */
  private val allowlist: Map[String, String] = Map(
    "q09_enumerate" ->
      "global row_number IS the operator under test, over a <=2000-row pre-filtered slice",
    "q14_shuffle_deterministic" ->
      "seeded-shuffle enumeration over a <=2000-row slice",
    "q133_kmeans_assign" ->
      "k-means seed fixture: row_number over an orderBy().limit(k<=8) frame",
    "q134_cluster_sample" ->
      "k-means seed fixture: row_number over an orderBy().limit(k<=8) frame",
    "q150_semantic_dedup_sharded" ->
      "k-means seed fixture: row_number over an orderBy().limit(8) frame",
    "q161_prototypicality_prune" ->
      "k-means seed fixture: row_number over an orderBy().limit(k<=8) frame",
    "q165_d4_pipeline" ->
      "k-means seed fixture: row_number over an orderBy().limit(k<=8) frame"
  )

  test("every unpartitioned WindowExec across ALL SparkEntry queries is allowlisted") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"testdata missing: $sf")
    // dedicated session: listeners are per-session, so parallel suites on
    // the shared context cannot pollute the attribution
    val session = spark.newSession()
    val hits = mutable.Map[String, List[String]]().withDefaultValue(Nil)
    @volatile var current = "<setup>"
    val listener = new QueryExecutionListener {
      private def record(qe: QueryExecution): Unit = {
        val ws = Bridge.unpartitionedWindows(qe.executedPlan)
        if (ws.nonEmpty)
          hits.synchronized { hits(current) = hits(current) ++ ws }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = record(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          error: Exception): Unit = record(qe)
    }
    session.listenerManager.register(listener)
    val failed = mutable.Buffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        Bridge.waitListenerBusEmpty(session) // drain the previous query's tail
        current = name
        try fn(session, sf).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => failed += s"$name: ${e.getMessage}" }
      }
      Bridge.waitListenerBusEmpty(session)
    } finally session.listenerManager.unregister(listener)
    assert(failed.isEmpty, s"queries failed during sweep:\n${failed.mkString("\n")}")

    val observed = hits.synchronized { hits.toMap }
    val unexpected = observed.keySet -- allowlist.keySet
    assert(unexpected.isEmpty,
      "NEW unpartitioned window(s) — a one-partition funnel reached a query plan:\n" +
        unexpected.toSeq.sorted.map(q =>
          s"  $q:\n    ${observed(q).distinct.mkString("\n    ")}").mkString("\n"))
    val stale = allowlist.keySet -- observed.keySet
    assert(stale.isEmpty,
      s"allowlist entries no longer occur (remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
