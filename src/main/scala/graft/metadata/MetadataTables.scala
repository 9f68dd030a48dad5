package graft.metadata

import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** The predicate-backend table surface (SURVEY.md §3.2, S11/S12): the four
  * logical facets — `predicates`, `result_indices`, `metadata_layout` (one
  * row), `metadata_content` — as DataFrames, with MNode blob decode under a
  * declared layout (the MetadataContentDatasetView analogue).
  */
object MetadataTables {

  /** Decode (ordinal, blob BINARY) metadata-content records into typed rows
    * under `layout`: output = (ordinal, <layout columns...>).
    */
  def decodeContent(blobs: DataFrame, layout: MetadataLayout,
      ordinalCol: String = "ordinal", blobCol: String = "blob"): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("ordinal",
        org.apache.spark.sql.types.LongType, nullable = false) +: layout.toStructType.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    blobs.select(col(ordinalCol).cast("long"), col(blobCol))
      .map { r =>
        val node = MNodeCodec.decode(r.getAs[Array[Byte]](1))
        Row.fromSeq(r.getLong(0) +: MNodeSpark.toRow(node, layout).toSeq)
      }(enc)
  }

  /** Encode typed rows into MNode blobs (the writer side): input columns
    * must match the layout; output (ordinal, blob).
    */
  def encodeContent(rows: DataFrame, layout: MetadataLayout,
      ordinalCol: String): DataFrame = {
    import MValue._
    val spark = rows.sparkSession
    val fields = layout.fields
    val cols = col(ordinalCol).cast("long") +: fields.map(f => col(f.name))
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)
    rows.select(cols: _*).map { r =>
      val vals: Seq[(String, MValue)] = fields.zipWithIndex.map { case (f, i) =>
        val v: MValue =
          if (r.isNullAt(i + 1)) Null
          else f.fieldType match {
            case FieldType.Text   => Str(r.get(i + 1).toString)
            case FieldType.IntT   => I64(r.getAs[Number](i + 1).longValue())
            case FieldType.FloatT => F64(r.getAs[Number](i + 1).doubleValue())
            case FieldType.BoolT  => Bool(r.getBoolean(i + 1))
            case FieldType.EnumT  => EnumStr(r.get(i + 1).toString)
          }
        f.name -> v
      }
      (r.getLong(0), MNodeCodec.encode(MNode(vals)))
    }(enc).toDF("ordinal", "blob")
  }
}
