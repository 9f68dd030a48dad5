package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — multi-dimensional file pruning for the
  * 100 TB table: interleaving the bits of two (bucketed) key columns and
  * range-partitioning + sorting files by the z-value clusters BOTH
  * dimensions into tiles, so parquet min/max stats prune files for a
  * selective filter on EITHER column. A 1-d sort only ever prunes its
  * leading column; that asymmetry is the whole point ([[ZOrderSpec]]
  * measures it: a y-only filter touches every x-sorted file but only the
  * matching tile row of the z-ordered layout).
  *
  * The z-value is plain Catalyst bit arithmetic (shift/and/add) — fully
  * whole-stage-codegen'd and byte-replayable in any engine (q207's
  * oracle recomputes it with the same shifts), no UDF, no hashing.
  * Inputs are non-negative ints already bucketed to `bits` bits
  * (rank/ntile continuous columns first — [[graft.operators.Ranking]]).
  */
object ZOrder {

  /** Interleave the low `bits` bits: a's bit i → z bit 2i, b's → 2i+1. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Inverse (for specs/round-trips): de-interleave z back to (a, b). */
  def unzValue(z: Column, bits: Int): (Column, Column) = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val a = (0 until bits).map(i =>
      shiftleft(shiftright(z, 2 * i).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    val b = (0 until bits).map(i =>
      shiftleft(shiftright(z, 2 * i + 1).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    (a, b)
  }

  /** Write `df` z-ordered on two bucketed key columns: range-partition on
    * the z-value into `nFiles` files, sort within, drop the helper
    * column. Each file covers a contiguous z-range = a tile in (a, b)
    * space; parquet min/max on BOTH columns then prune per-file.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, nFiles: Int): Unit = {
    val zc = "_graft_z"
    require(!df.columns.contains(zc), s"zorderWrite: input column $zc is reserved")
    df.withColumn(zc, zValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
