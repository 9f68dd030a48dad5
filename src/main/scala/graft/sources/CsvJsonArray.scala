package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8: CSV scan with auto-detected embedded JSON number-array column and
  * header detection (reference readers/CsvJsonArrayStreamer.java:44-215):
  * one sampling pass finds the single column whose values are JSON arrays
  * of numbers (multiple array columns are an error), decides whether row 1
  * is a header, then the distributed scan parses that column with
  * `from_json` — Spark subsumes the streaming loop.
  */
object CsvJsonArray {

  private val jsonArrayPattern = "^\\s*\\[\\s*[\\d.\\-].*\\]\\s*$".r

  private def isJsonNumberArray(field: String): Boolean =
    jsonArrayPattern.matches(field) && {
      val inner = field.trim.stripPrefix("[").stripSuffix("]")
      inner.split(",").forall(p => p.trim.toDoubleOption.isDefined)
    }

  final case class Detection(vectorColumn: Int, hasHeader: Boolean, nColumns: Int)

  /** The sampling pass (driver-side, reads at most 2 lines — exactly the
    * reference's initialize()).
    */
  def detect(spark: SparkSession, path: String): Detection = {
    val lines = spark.read.text(path).limit(2).collect().map(_.getString(0))
    require(lines.nonEmpty, s"empty CSV file: $path")
    // naive CSV split is what the reference uses for detection (quoted commas
    // inside the vector column are brackets-delimited, so splitting on
    // commas OUTSIDE brackets)
    def split(line: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var depth = 0
      var inQuote = false
      line.foreach {
        case '"' => inQuote = !inQuote
        case '[' if !inQuote => depth += 1; sb.append('[')
        case ']' if !inQuote => depth -= 1; sb.append(']')
        case ',' if depth == 0 && !inQuote => out += sb.toString; sb.clear()
        case c => sb.append(c)
      }
      out += sb.toString
      out.toArray
    }
    def vectorCol(fields: Array[String]): Option[Int] = {
      val hits = fields.zipWithIndex.collect {
        case (f, i) if isJsonNumberArray(f.trim.stripPrefix("\"").stripSuffix("\"")) => i
      }
      require(hits.length <= 1,
        s"multiple JSON array columns found in $path; only one is supported")
      hits.headOption
    }
    val first = split(lines(0))
    val firstVec = vectorCol(first)
    if (lines.length == 1) {
      val c = firstVec.getOrElse(throw new IllegalArgumentException(
        s"no JSON number-array column in $path"))
      return Detection(c, hasHeader = false, first.length)
    }
    val second = split(lines(1))
    val secondVec = vectorCol(second)
    (firstVec, secondVec) match {
      case (None, Some(c)) => Detection(c, hasHeader = true, second.length) // header row has no array
      case (Some(c), _)    => Detection(c, hasHeader = false, first.length)
      case (None, None) => throw new IllegalArgumentException(
        s"no JSON number-array column in $path")
    }
  }

  /** Scan: (ordinal, vector ARRAY<FLOAT>) plus the remaining CSV columns. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val det = detect(spark, path)
    val df = spark.read
      .option("header", det.hasHeader)
      .option("quote", "\"")
      .csv(path)
    val vecField = df.columns(det.vectorColumn)
    df.withColumn("vector", from_json(col(vecField), ArrayType(FloatType)))
      .drop(vecField)
  }
}
