package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern literal scanning for blocklist / keyword tagging — the
  * scale path for "does this doc contain any of these N terms": one
  * Aho-Corasick pass per document, O(len + matches) regardless of how many
  * terms the list holds (a regex alternation or per-term `contains` loop is
  * O(len · terms) and melts at blocklist sizes; reference's content scanning
  * is single-pattern, `datatools-vectordata`'s content-type sniffing).
  *
  * Semantics: case-sensitive SUBSTRING matching (callers lowercase both
  * sides for case-insensitive use); overlapping occurrences all count
  * (every (term, end-position) pair is one hit — "aa" occurs twice in
  * "aaa"). Terms must be non-empty; duplicate terms are collapsed.
  *
  * Scale shape: the automaton is built ONCE from the broadcast term list
  * per executor (lazy val keyed by the terms' identity) and each partition
  * streams its documents through it — no shuffle at all for tagging; the
  * per-doc hit map is bounded by |terms|.
  */
object Blocklist {

  /** Compact Aho-Corasick automaton: goto maps, BFS failure links, and
    * per-node output term indexes (inherited through fail links at build
    * time, so matching never walks the fail chain per character).
    */
  final class Automaton(val terms: Array[String]) extends Serializable {
    require(terms.nonEmpty, "Blocklist: empty term list")
    require(terms.forall(_.nonEmpty), "Blocklist: empty-string term")

    private val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val outLists = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

    terms.zipWithIndex.foreach { case (t, ti) =>
      var node = 0
      t.foreach { ch =>
        val m = gotoMaps(node)
        node = if (m.containsKey(ch)) m.get(ch) else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          outLists += Nil
          m.put(ch, gotoMaps.length - 1)
          gotoMaps.length - 1
        }
      }
      outLists(node) = ti :: outLists(node)
    }

    private val fail = new Array[Int](gotoMaps.length)
    locally { // BFS: fail links + output inheritance
      val queue = new java.util.ArrayDeque[Int]()
      val rootIt = gotoMaps(0).entrySet().iterator()
      while (rootIt.hasNext) {
        val child = rootIt.next().getValue.intValue
        fail(child) = 0
        queue.add(child)
      }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue
        val it = gotoMaps(u).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val ch = e.getKey.charValue
          val v = e.getValue.intValue
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fail(f)
          fail(v) = if (gotoMaps(f).containsKey(ch) && gotoMaps(f).get(ch) != v)
            gotoMaps(f).get(ch) else 0
          outLists(v) = outLists(v) ++ outLists(fail(v))
          queue.add(v)
        }
      }
    }

    private val gotoArr = gotoMaps.toArray
    private val outArr = outLists.map(_.toArray).toArray

    /** Per-term overlapping occurrence counts in `text` (indexes into
      * `terms`; zero-count terms absent).
      */
    def countHits(text: String): Map[Int, Long] = {
      val counts = scala.collection.mutable.HashMap.empty[Int, Long]
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !gotoArr(node).containsKey(ch)) node = fail(node)
        if (gotoArr(node).containsKey(ch)) node = gotoArr(node).get(ch)
        val out = outArr(node)
        var j = 0
        while (j < out.length) {
          counts(out(j)) = counts.getOrElse(out(j), 0L) + 1L
          j += 1
        }
        i += 1
      }
      counts.toMap
    }
  }

  // one automaton per distinct term list per executor JVM — builds are
  // never per-row/per-partition. BOUNDED: a single job only ever uses one
  // term list, but executors are long-lived across jobs, so an unbounded
  // map would accumulate one O(total-term-chars) automaton per blocklist
  // forever; access-order LRU keeps the working set (current job + a few
  // recent) and evicts the rest.
  private val cacheCapacity = 8
  private lazy val cache =
    new java.util.LinkedHashMap[Seq[String], Automaton](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], Automaton]): Boolean =
        size() > cacheCapacity
    }
  // lock-free fast path: a broadcast term list deserializes to ONE
  // instance per executor, so after the first row the `eq` check hits and
  // the per-row cost is two reads — the synchronized LRU is touched once
  // per (job, executor), not per row
  @volatile private var last: (Seq[String], Automaton) = null
  private def automatonFor(terms: Seq[String]): Automaton = {
    val l = last
    if (l != null && (l._1 eq terms)) l._2
    else cache.synchronized {
      val a = cache.computeIfAbsent(terms, ts => new Automaton(ts.distinct.toArray))
      last = (terms, a)
      a
    }
  }
  private[operators] def cachedAutomatonCount: Int =
    cache.synchronized(cache.size())

  /** Tag every document with its blocklist hits: (id, term, n_hits) rows,
    * only for terms that occur (n_hits >= 1, overlapping counted).
    */
  def tagMatches(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val distinctTerms = terms.distinct
    val bc = spark.sparkContext.broadcast(distinctTerms)
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts = bc.value
        automatonFor(ts).countHits(text).toSeq.map {
          case (ti, n) => (id, ts(ti), n)
        }
      }
      .toDF("id", "term", "n_hits")
  }

  /** Per-document rollup over ALL input docs (zero-hit docs surface with
    * zeros — the filter gate reads this): (id, total_hits, distinct_terms).
    */
  def hitCounts(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    docs.select(col(idCol).cast("long").as("id"))
      .join(tagMatches(docs, idCol, textCol, terms)
        .groupBy("id")
        .agg(sum("n_hits").as("th"), count(lit(1)).as("dt")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("th"), lit(0L)).as("total_hits"),
        coalesce(col("dt"), lit(0L)).as("distinct_terms"))
}
