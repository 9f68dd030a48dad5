package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming crawl ingest: `spark.readStream.format("warc").load(dir)` —
  * WARC shards land in a directory as the crawl produces them and each
  * micro-batch picks up exactly the NEW files (one task per file, the
  * same parallelism as [[WarcIO.read]]). Completes the raw-crawl spine's
  * streaming twin: shards → main text → quality/dedup incrementally,
  * with the downstream operators' existing streaming forms (dedup,
  * sketches, funnel) unchanged.
  *
  * Offsets are FILE COUNTS over the lexicographically-sorted listing —
  * the natural granularity (a shard is the crawl's unit of arrival, and
  * a ~1 GB shard is one sensible task). CONTRACT: shard names must be
  * lexicographically increasing in arrival order (the crawl convention —
  * shard names carry sequence numbers/timestamps); a late file sorting
  * into the consumed prefix is detected at the next trigger and fails
  * LOUDLY rather than silently shifting offsets. `Trigger.AvailableNow`
  * snapshots the listing at query start, so a bounded directory behaves
  * as a run-to-completion stream (stream == batch; WarcStreamSpec pins
  * it). `maxFilesPerTrigger` bounds a micro-batch.
  *
  * Batch reads work through the same table
  * (`spark.read.format("warc").load(dir)` ≡ [[WarcIO.read]]).
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = options.get("path")
    require(path != null, "warc source requires a path")
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map(_.toInt).getOrElse(0)
    new WarcTable(path, maxFiles)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object WarcTable {
  /** The [[WarcIO.WarcRecord]] shape. */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("text", StringType, nullable = true)))

  def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(x => x.getName.endsWith(".warc") ||
        x.getName.endsWith(".warc.gz")).map(_.getPath).sorted.toSeq
    else if (f.exists()) Seq(path)
    else Seq.empty
  }
}

class WarcTable(path: String, maxFilesPerTrigger: Int)
    extends Table with SupportsRead {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path, maxFilesPerTrigger)
}

class WarcScanBuilder(path: String, maxFilesPerTrigger: Int) extends ScanBuilder {
  override def build(): Scan = new WarcScan(path, maxFilesPerTrigger)
}

class WarcScan(path: String, maxFilesPerTrigger: Int) extends Scan {
  override def readSchema(): StructType = WarcTable.schema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      WarcTable.listFiles(path).map(WarcInputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new WarcReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(path, maxFilesPerTrigger)
}

final case class WarcInputPartition(file: String) extends InputPartition

final case class WarcFileOffset(files: Long) extends Offset {
  override def json(): String = files.toString
}

class WarcMicroBatchStream(path: String, maxFilesPerTrigger: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // listing snapshot taken at each latestOffset — planInputPartitions
  // slices THIS listing so an offset always resolves to the same files
  @volatile private var listing: Seq[String] = WarcTable.listFiles(path)
  @volatile private var availableNowCap: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit = {
    listing = WarcTable.listFiles(path)
    availableNowCap = listing.size.toLong
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = WarcFileOffset(0L)

  override def latestOffset(): Offset = {
    val cur = WarcTable.listFiles(path)
    // a late shard sorting into the already-consumed prefix would shift
    // every offset — fail loudly (the shard-naming contract): the new
    // listing must EXTEND the previous one (same prefix, no removals)
    require(cur.size >= listing.size &&
        listing.zip(cur).forall { case (a, b) => a == b },
      s"warc stream: directory $path changed non-append-only (a shard " +
        "was removed or arrived sorting before consumed shards; shard " +
        "names must be lexicographically increasing in arrival order)")
    listing = cur
    val cap = if (availableNowCap >= 0) math.min(availableNowCap, cur.size.toLong)
      else cur.size.toLong
    WarcFileOffset(cap)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[WarcFileOffset].files
    val hi = latestOffset().asInstanceOf[WarcFileOffset].files
    val capped = if (maxFilesPerTrigger > 0) math.min(hi, lo + maxFilesPerTrigger)
      else hi
    WarcFileOffset(math.max(lo, capped))
  }

  override def reportLatestOffset(): Offset =
    WarcFileOffset(WarcTable.listFiles(path).size.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WarcFileOffset].files.toInt
    val hi = end.asInstanceOf[WarcFileOffset].files.toInt
    val snap = listing
    require(snap.size >= hi,
      s"warc stream: offset $hi exceeds the ${snap.size}-file listing of $path " +
        "(a consumed shard disappeared, or names arrived out of sorted order)")
    snap.slice(lo, hi).map(WarcInputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new WarcReaderFactory

  override def deserializeOffset(json: String): Offset =
    WarcFileOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class WarcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WarcInputPartition].file
    new PartitionReader[InternalRow] {
      private val it = WarcIO.recordsOf(file)
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val r = it.next()
        current = new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.file), UTF8String.fromString(r.warc_type),
          UTF8String.fromString(r.url), UTF8String.fromString(r.content_type),
          r.content_length, UTF8String.fromString(r.warc_date),
          r.offset, r.length, r.payload,
          if (r.text == null) null else UTF8String.fromString(r.text)))
        true
      }
      override def get(): InternalRow = current
      // a no-op here leaks the file descriptor when the query abandons
      // the scan early (a LIMIT, a killed task) — Spark calls close() on
      // every code path, so thread it to the scanner's stream
      override def close(): Unit = it.close()
    }
  }
}
