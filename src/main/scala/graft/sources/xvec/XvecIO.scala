package graft.sources.xvec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DataFrame-level xvec read/write helpers (S1-S6 scans, S18 sinks).
  *
  * Reading is the DSv2 (`format("xvec")`) with window + ordinal pushdown.
  * Writing streams the DataFrame ordinal-sorted through a single file —
  * xvec is a bare record concatenation, so the distributed form is
  * "executors write ordinal-range shards, driver concatenates"; at local
  * scale the sorted toLocalIterator stream is the same thing with one
  * writer (memory-bounded: one partition in flight).
  */
object XvecIO {

  def read(spark: SparkSession, path: String, window: String = null): DataFrame = {
    val r = spark.read.format("xvec")
    (if (window != null) r.option("window", window) else r).load(path)
  }

  /** Write (ordinal, vector) to one xvec file, ordinal-ordered. Returns the
    * record count.
    */
  def write(df: DataFrame, path: String, format: String = null): Long = {
    val fmt = Option(format).map(XvecFormat.forName).getOrElse(XvecFormat.forPath(path))
    val sorted = df.select(col("ordinal"),
        col("vector").cast(s"array<${fmt.elementType.sql.toLowerCase}>").as("vector"))
      .orderBy("ordinal")
    val it = sorted.toLocalIterator()
    var rows = Iterator.continually(it).takeWhile(_ => it.hasNext).map(_.next())
    XvecFormat.writeLocal(path, fmt, rows.map(_.getSeq[Any](1)))
  }
}
