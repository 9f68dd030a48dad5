package graft.sources.slab

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The slab paged record store re-expressed as a managed table (SURVEY.md
  * S10/S19/S21/S22, J5, W3, A15; reference datatools-io-slabtastic —
  * docs/reference.md:7-170). Per the blueprint, the page/binary machinery is
  * replaced by Parquet: logical model `(namespace STRING, ordinal LONG,
  * data BINARY)`, partitioned by namespace, ordinal-sorted within files so
  * min/max stats give the page-index O(log n) lookup for free.
  *
  * Preserved semantics:
  *  - strictly-ascending ordinal appends per namespace (reference.md:120-131)
  *  - point get + batch multi-get returning results in submission order with
  *    page coalescing (SlabReader.getAll, SlabReader.java:268-344 — here the
  *    join + sorted parquet gives the coalescing)
  *  - per-namespace stats (CMD_slab_analyze/namespaces)
  *  - text/jsonl/csv import with ordinal assignment (CMD_slab_import)
  */
class SlabTable(spark: SparkSession, dir: String) {

  private def nsPath(ns: String) = s"$dir/ns=$ns"
  private def tombPath(ns: String) = s"$dir/tomb=$ns"
  private def wmPath(ns: String) = s"$dir/wm=$ns"
  private def asidePath(ns: String) = s"$dir/.old-$ns"
  private def wmAsidePath(ns: String) = s"$dir/.wm-old-$ns"
  private def exists(p: String) = new java.io.File(p).exists()

  /** Heal a mid-[[compact]] crash (the reference's write-then-rename
    * discipline, datatools-io-slabtastic docs/reference.md:157-162, makes
    * every interleaving leave a complete generation — this is the read-side
    * half). If the rename-aside dir exists WITHOUT a live dir, the crash
    * hit between the two renames: restore the old generation (tombstones
    * are still present, so the restored view is exactly pre-compact). If
    * both exist, the crash hit after the new generation went live: the
    * aside copy is garbage — drop it (the tombstone anti-join over the
    * already-compacted data is a no-op, so reads were already correct).
    */
  private def recover(ns: String): Unit = {
    val live = new java.io.File(nsPath(ns))
    val aside = new java.io.File(asidePath(ns))
    if (aside.exists()) {
      if (!live.exists())
        require(aside.renameTo(live), s"slab recover: could not restore $aside")
      else rmTree(aside)
    }
    // the watermark swap is rename-aside/rename-in/delete-aside, same as
    // the data swap: a crash between the renames leaves the old watermark
    // in the aside dir only — restore it so the ceiling never drops even
    // when a PRIOR compact already reclaimed the top tombstoned ordinals
    // (raw data max < wm) and the data itself no longer carries it
    val wmLive = new java.io.File(wmPath(ns))
    val wmAside = new java.io.File(wmAsidePath(ns))
    if (wmAside.exists()) {
      if (!wmLive.exists())
        require(wmAside.renameTo(wmLive),
          s"slab recover: could not restore watermark $wmAside")
      else rmTree(wmAside)
    }
  }

  private def rawRead(ns: String): DataFrame = spark.read.parquet(nsPath(ns))

  /** Live view: tombstoned ordinals are hidden until [[compact]] reclaims
    * them (the reference's dead-page discipline: deletes mark, GC frees).
    */
  def read(ns: String): DataFrame = {
    recover(ns)
    val live =
      if (exists(tombPath(ns)))
        rawRead(ns).join(spark.read.parquet(tombPath(ns)).select("ordinal"),
          Seq("ordinal"), "left_anti")
      else rawRead(ns)
    live.select(lit(ns).as("namespace"), col("ordinal"), col("data"))
  }

  def namespaces(): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("ns="))
      .map(_.getName.stripPrefix("ns=")).sorted.toSeq
  }

  /** High watermark over every ordinal EVER appended (deleted or not) —
    * the ascending-append constraint survives deletion and compaction.
    */
  def maxOrdinal(ns: String): Long = {
    recover(ns)
    val dataMax: Option[Long] =
      if (!exists(nsPath(ns))) None
      else {
        val r = rawRead(ns).agg(max("ordinal")).collect()(0)
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
    val wm: Option[Long] =
      if (!exists(wmPath(ns))) None
      else spark.read.parquet(wmPath(ns)).agg(max("ordinal")).collect()
        .headOption.filter(!_.isNullAt(0)).map(_.getLong(0))
    (dataMax.toSeq ++ wm.toSeq).reduceOption(_ max _).getOrElse(-1L)
  }

  /** Append (ordinal, data) rows; every new ordinal must exceed the current
    * maximum (the slab append constraint). Rows are range-sorted so parquet
    * row-group stats index the ordinal space.
    */
  def append(ns: String, records: DataFrame): Unit = {
    // one validation pass: min ordinal (ascending-append check) + total vs
    // distinct count (duplicate check) in a single aggregation job
    val stats = records.agg(min("ordinal"), count(lit(1)),
      count_distinct(col("ordinal"))).collect()(0)
    if (stats.isNullAt(0)) return // empty batch: nothing to append
    val newMin = stats.getLong(0)
    val existing = maxOrdinal(ns)
    require(newMin > existing,
      s"slab append requires strictly ascending ordinals: new min $newMin <= existing max $existing")
    require(stats.getLong(1) == stats.getLong(2), "duplicate ordinals in append batch")
    records.select(col("ordinal").cast("long").as("ordinal"), col("data"))
      .repartitionByRange(col("ordinal"))
      .sortWithinPartitions("ordinal")
      .write.mode(SaveMode.Append).parquet(nsPath(ns))
  }

  /** Point lookup (ordinal pushdown → row-group pruned read). */
  def get(ns: String, ordinal: Long): Option[Array[Byte]] =
    read(ns).filter(col("ordinal") === ordinal).select("data")
      .collect().headOption.map(_.getAs[Array[Byte]](0))

  /** Batch multi-get: results in submission order (J5) via the carried
    * request index; missing ordinals yield null data.
    */
  def getAll(ns: String, requests: DataFrame): DataFrame = {
    val req = requests.select(col("request_idx").cast("long"), col("ordinal").cast("long"))
    req.join(read(ns).select("ordinal", "data"), Seq("ordinal"), "left")
      .orderBy("request_idx")
      .select("request_idx", "ordinal", "data")
  }

  /** A15: per-namespace record counts + byte sizes. */
  def stats(): DataFrame = {
    val frames = namespaces().map { ns =>
      read(ns).agg(
        lit(ns).as("namespace"),
        count(lit(1)).as("records"),
        sum(octet_length(col("data"))).as("bytes"),
        min("ordinal").as("min_ordinal"),
        max("ordinal").as("max_ordinal"))
    }
    frames.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)
  }

  /** S21 import: lines/jsonl/csv → records with ordinals assigned in input
    * order via the distributed two-pass numbering
    * ([[graft.operators.Ranking.fileOrderOrdinal]]: per-partition counts →
    * broadcast offsets → per-partition numbering — no shuffle, no
    * single-partition window; the text source's partition order IS file
    * order, so the total order the ascending-append contract needs is
    * preserved exactly).
    */
  def importText(ns: String, path: String): Unit = {
    val base = maxOrdinal(ns) + 1
    val numbered = graft.operators.Ranking.fileOrderOrdinal(
      spark.read.text(path), "_fo")
    append(ns, numbered.select((col("_fo") + base).as("ordinal"),
      encode(col("value"), "UTF-8").as("data")))
  }

  /** S22 export: records → text lines (UTF-8 payloads). */
  def exportText(ns: String, path: String): Unit =
    read(ns).orderBy("ordinal")
      .select(decode(col("data"), "UTF-8").as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Mark ordinals deleted (tombstones — the data files are untouched;
    * [[read]] hides the rows, [[compact]] reclaims the space).
    */
  def delete(ns: String, ordinals: DataFrame): Unit = {
    recover(ns)
    require(exists(nsPath(ns)), s"slab delete: unknown namespace $ns")
    ordinals.select(col("ordinal").cast("long").as("ordinal")).distinct()
      .write.mode(SaveMode.Append).parquet(tombPath(ns))
  }

  /** Tombstoned-but-unreclaimed ordinal count — the GC-pressure gauge. */
  def deadCount(ns: String): Long =
    if (!exists(tombPath(ns))) 0L
    else spark.read.parquet(tombPath(ns)).select("ordinal").distinct().count()

  /** Dead-page GC as a rewrite job (the reference's compaction model,
    * SURVEY §2 slab append-constraint row): rewrite the live rows
    * range-sorted into fresh files, persist the pre-compaction high
    * watermark (so ascending-append never reuses a reclaimed ordinal),
    * and drop the tombstones.
    *
    * CRASH-ATOMIC, the reference's `.buffer`-then-rename discipline
    * (docs/reference.md:157-162): the new generation is fully written to a
    * tmp dir, the watermark is persisted BEFORE the old data moves (so the
    * ascending-append ceiling survives any crash), and the swap is two
    * atomic renames (live → aside, tmp → live) with [[recover]] healing
    * the one window where neither name holds the data. Every interleaving
    * leaves either the complete old generation (restorable) or the
    * complete new one — [[SlabCrashSpec]] injects a crash after every
    * step and proves it.
    */
  def compact(ns: String): Unit = compactWithFailpoint(ns, Int.MaxValue)

  /** [[compact]] with a crash injected after `failAfter` completed steps
    * (test hook — production passes MaxValue). Steps: 1 new generation
    * written to tmp; 2 new watermark staged; 3 old watermark renamed
    * aside; 4 staged watermark renamed live; 5 watermark aside deleted;
    * 6 live data renamed aside; 7 tmp renamed live; 8 data aside deleted;
    * 9 tombstones deleted. Both swaps (watermark and data) are
    * rename-aside/rename-in/delete-aside, so every crash window leaves a
    * name [[recover]] can heal from.
    */
  private[slab] def compactWithFailpoint(ns: String, failAfter: Int): Unit = {
    recover(ns)
    require(exists(nsPath(ns)), s"slab compact: unknown namespace $ns")
    // GC orphans of earlier crashed compacts (tmp generations that never
    // went live, watermark staging dirs) — never referenced once orphaned
    new java.io.File(dir).listFiles().filter(f =>
      f.getName.startsWith(s".compact-$ns-") || f.getName.startsWith(s".wm-$ns-"))
      .foreach(rmTree)
    def crash(step: Int): Unit =
      if (failAfter == step) throw new RuntimeException(s"injected crash after step $step")
    val hw = maxOrdinal(ns)
    val tmp = s"$dir/.compact-$ns-${System.nanoTime()}"
    read(ns).select("ordinal", "data")
      .repartitionByRange(col("ordinal"))
      .sortWithinPartitions("ordinal")
      .write.parquet(tmp)
    crash(1)
    // watermark FIRST: until the data swap below, the live data itself
    // still carries every non-reclaimed ordinal, and hw here folds in any
    // previously persisted watermark, so the new staged value is >= the
    // old one; the old watermark goes aside (not deleted) before the new
    // one renames in, so no crash window loses the persisted ceiling even
    // when a prior compact already reclaimed the top ordinals
    if (hw >= 0L) {
      import spark.implicits._
      val wmTmp = s"$dir/.wm-$ns-${System.nanoTime()}"
      Seq(hw).toDF("ordinal").coalesce(1).write.parquet(wmTmp)
      crash(2)
      val wmLive = new java.io.File(wmPath(ns))
      val wmAside = new java.io.File(wmAsidePath(ns))
      require(!wmAside.exists(), s"slab compact: stale wm aside dir $wmAside")
      if (wmLive.exists())
        require(wmLive.renameTo(wmAside),
          s"slab compact: could not move watermark $wmLive aside")
      crash(3)
      require(new java.io.File(wmTmp).renameTo(wmLive),
        s"slab compact: could not swap watermark $wmTmp into place")
      crash(4)
      rmTree(wmAside)
    }
    crash(5)
    val live = new java.io.File(nsPath(ns))
    val aside = new java.io.File(asidePath(ns))
    require(!aside.exists(), s"slab compact: stale aside dir $aside")
    require(live.renameTo(aside), s"slab compact: could not move $live aside")
    crash(6)
    require(new java.io.File(tmp).renameTo(live),
      s"slab compact: could not swap $tmp into place")
    crash(7)
    rmTree(aside)
    crash(8)
    rmTree(new java.io.File(tombPath(ns)))
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    if (f.exists()) f.delete()
  }
}
