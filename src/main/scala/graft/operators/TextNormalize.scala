package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unicode NFC normalization — the canonicalization pass that belongs
  * BEFORE any hash-keyed text operation (exact dedup, fingerprinting,
  * shingle hashing): the same visible text can arrive precomposed (é) or
  * decomposed (e + U+0301), and without canonical composition those hash
  * as different documents. Spark has no built-in normalizer, so this is a
  * typed per-row kernel over `java.text.Normalizer` (ICU-conformant NFC,
  * byte-equal to SQL engines' `nfc_normalize` — the q146 oracle proves the
  * md5s match) — a pure map, zero shuffle, streaming-composable.
  */
object TextNormalize {

  def nfc(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
      }
      .toDF(idCol, "text_nfc")
  }
}
