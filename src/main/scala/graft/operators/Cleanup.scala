package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Zero/duplicate vector hygiene (SURVEY.md A2/A4/A5/U4; reference
  * `cleanup cleanfvec` and `count_zeros`, README.md:36-44,108-110 — the
  * generator deliberately injects both, TestDataFiles.java:57-100).
  *
  * Duplicate detection pre-groups on a 64-bit hash of the vector so the
  * shuffle key is 8 bytes, not the vector payload; exact equality is then
  * confirmed within hash groups (collision-safe at any scale).
  */
object Cleanup {

  def isZeroVector(vec: Column): Column =
    forall(vec, x => x === 0.0f)

  /** A2: vectors that are exactly all-zero. */
  def countZeros(df: DataFrame, vecCol: String): DataFrame =
    df.agg(sum(when(isZeroVector(col(vecCol)), 1L).otherwise(0L)).as("n_zero"))

  /** A5: duplicate groups — (vector, multiplicity) for multiplicity > 1. */
  def duplicateGroups(df: DataFrame, vecCol: String): DataFrame =
    df.groupBy(xxhash64(col(vecCol)).as("h"), col(vecCol))
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1)
      .drop("h")

  /** A4 `cleanfvec`: drop all-zero vectors, then keep one representative per
    * duplicate group (the lowest id — deterministic).
    */
  def clean(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val nonZero = df.filter(!isZeroVector(col(vecCol)))
    val keeper = nonZero
      .groupBy(xxhash64(col(vecCol)).as("h"), col(vecCol))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    nonZero.join(keeper, Seq(idCol), "left_semi")
  }
}
