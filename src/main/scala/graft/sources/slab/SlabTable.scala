package graft.sources.slab

import org.apache.spark.sql.expressions.Window
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

  def read(ns: String): DataFrame =
    spark.read.parquet(nsPath(ns)).select(lit(ns).as("namespace"), col("ordinal"), col("data"))

  def namespaces(): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName.stripPrefix("ns=")).sorted.toSeq
  }

  def maxOrdinal(ns: String): Long =
    if (!new java.io.File(nsPath(ns)).exists()) -1L
    else read(ns).agg(max("ordinal")).collect()(0).getLong(0)

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
    * order (file order + line position; a global row_number over a
    * monotonic id keeps the assignment deterministic).
    */
  def importText(ns: String, path: String): Unit = {
    val raw = spark.read.text(path)
      .select(col("value"), monotonically_increasing_id().as("mid"))
    val withOrd = raw.select(
      (row_number().over(Window.orderBy("mid")) - 1 + (maxOrdinal(ns) + 1)).as("ordinal"),
      encode(col("value"), "UTF-8").as("data"))
    append(ns, withOrd)
  }

  /** S22 export: records → text lines (UTF-8 payloads). */
  def exportText(ns: String, path: String): Unit =
    read(ns).orderBy("ordinal")
      .select(decode(col("data"), "UTF-8").as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
}
