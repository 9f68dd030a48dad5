package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join: for every left row, the single most
  * recent right row with the same key and `right.time <= left.time` — the
  * join a feature-store / training-label pipeline runs ("state as of event
  * time"). Extends the reference's join surface (its joins are ordinal/
  * facet zips, vectordata ... fvec/ivec pairing) with the temporal join a
  * 100TB event corpus needs.
  *
  * Scale shape: the naive form is a range join (equi-key + inequality),
  * which Spark executes as a per-key cartesian filtered late — quadratic in
  * hot keys. This implementation instead UNIONS both sides tagged, sorts
  * once within key, and carries the latest right payload forward with a
  * running `last(ignoreNulls)` window — ONE shuffle on the key, linear work,
  * external-sort spill for skewed keys, no pair space at any point.
  *
  * Ties: a right row AT the left timestamp qualifies (<=). Multiple right
  * rows on the same (key, time) resolve to the greatest `tieCol`; the
  * result is deterministic when `tieCol` is unique per (key, time) — pass
  * a row id as the tie column to guarantee that.
  *
  * Nulls: right rows with a null key or null time never qualify (they are
  * filtered before the union). Left rows always survive; a left row with a
  * null key or null time gets a null as-of payload (null never matches).
  *
  * Output: every left row/column, plus each requested right payload column
  * as `asof_<name>` (null when no right row precedes). Left columns named
  * `asof_<a requested payload>` are rejected up front — the output would
  * silently carry two columns with one name.
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asof: at least one right payload column")
    val outPayload = payloadCols.distinct
    val clash = outPayload.map("asof_" + _).toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asof: left columns collide with output names: ${clash.mkString(", ")}")
    val payload = struct((tieCol +: outPayload).distinct.map(col): _*)
    val r = right
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(
        col(keyCol).as("_k"), col(timeCol).as("_t"),
        lit(0).as("_side"), col(tieCol).as("_tie"), payload.as("_payload"))
    val payloadType = r.schema("_payload").dataType
    val tieType = r.schema("_tie").dataType
    val l = left.select(
      col(keyCol).as("_k"), col(timeCol).as("_t"),
      lit(1).as("_side"), lit(null).cast(tieType).as("_tie"),
      lit(null).cast(payloadType).as("_payload"),
      struct(left.columns.map(col): _*).as("_row"))
    // right rows sort BEFORE the left row at an equal timestamp (side 0 < 1)
    // so boundary-time rows are visible; among equal (t, side) the largest
    // tie wins because `last` reads the frame in sort order. A null left
    // time sorts first (nulls-first ascending) — no right row precedes it
    // in the frame, so its as-of payload is null, and null-key left rows
    // partition with no right rows at all (right nulls were filtered).
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = r.withColumn("_row", lit(null).cast(l.schema("_row").dataType))
      .unionByName(l)
    unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        (left.columns.map(c => col(s"_row.$c").as(c)) ++
          outPayload.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }
}
