package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.sources.xvec.XvecIO

/** S20: vector sinks beyond xvec — json/csv/yaml forms of
  * `TestDataFiles.saveToFile` (reference datagen/TestDataFiles.java:105-140).
  * json/csv are distributed writes; yaml (a config-scale format) streams on
  * the driver like the reference does.
  */
object VectorSinks {

  /** (ordinal, vector) → one JSON object per line. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.select("ordinal", "vector").orderBy("ordinal")
      .write.mode(SaveMode.Overwrite).json(path)

  /** (ordinal, vector) → CSV with the vector as a JSON array string. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.select(col("ordinal"), to_json(col("vector")).as("vector"))
      .orderBy("ordinal")
      .write.mode(SaveMode.Overwrite).option("quote", "\"").csv(path)

  /** (ordinal, vector) → a single YAML list document (driver-side). */
  def writeYaml(df: DataFrame, path: String): Unit = {
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.FileWriter(path), 1 << 20))
    try {
      val it = df.select("vector").orderBy("ordinal").toLocalIterator()
      while (it.hasNext) {
        out.println("- [" + it.next().getSeq[Any](0).mkString(", ") + "]")
      }
    } finally out.close()
  }

  /** xvec family (fvec/ivec/bvec/dvec/svec/mvec) via the binary writer. */
  def writeXvec(df: DataFrame, path: String): Long = XvecIO.write(df, path)

  def write(df: DataFrame, path: String, format: String): Unit = format.toLowerCase match {
    case "json" => writeJson(df, path)
    case "csv"  => writeCsv(df, path)
    case "yaml" => writeYaml(df, path)
    case f      => writeXvec(df, path + (if (path.contains('.')) "" else s".$f"))
  }
}
