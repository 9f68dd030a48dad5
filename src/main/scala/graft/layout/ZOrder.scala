package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — multi-dimensional file pruning for the
  * 100 TB table: interleaving the bits of n (bucketed) key columns and
  * range-partitioning + sorting files by the z-value clusters ALL
  * dimensions into tiles, so parquet min/max stats prune files for a
  * selective filter on ANY column. A 1-d sort only ever prunes its
  * leading column; that asymmetry is the whole point ([[ZOrderSpec]]
  * measures it in 2-D and 3-D: a trailing-dim filter touches every
  * sorted file but only the matching tile rows of the z-ordered layout).
  *
  * The z-value is plain Catalyst bit arithmetic (shift/and/add) — fully
  * whole-stage-codegen'd and byte-replayable in any engine (q207/q232's
  * oracles recompute it with the same shifts), no UDF, no hashing.
  * Inputs are non-negative ints already bucketed to `bits` bits
  * (rank/ntile continuous columns first — [[graft.operators.Ranking]]).
  */
object ZOrder {

  /** Round-robin interleave of n columns' low `bits` bits: column j's
    * bit i lands at z bit `i*n + j` (the bit-budget split: every column
    * contributes equally at every scale level). n·bits must fit a signed
    * long's positive range.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zValueN needs >= 2 columns, got ${cols.size}")
    require(bits > 0 && cols.size * bits <= 62,
      s"n*bits must be in [1, 62], got ${cols.size} * $bits")
    val n = cols.size
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ + _)
  }

  /** Inverse of [[zValueN]] (for specs/round-trips). */
  def unzValueN(z: Column, n: Int, bits: Int): Seq[Column] = {
    require(n >= 2 && bits > 0 && n * bits <= 62,
      s"n*bits must be in [1, 62], got $n * $bits")
    (0 until n).map { j =>
      (0 until bits).map(i =>
        shiftleft(shiftright(z, i * n + j).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    }
  }

  /** Interleave the low `bits` bits of two columns: a's bit i → z bit 2i,
    * b's → 2i+1 (the n=2 case of [[zValueN]], kept as the common entry).
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    zValueN(Seq(a, b), bits)
  }

  /** Inverse (for specs/round-trips): de-interleave z back to (a, b). */
  def unzValue(z: Column, bits: Int): (Column, Column) = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val cs = unzValueN(z, 2, bits)
    (cs(0), cs(1))
  }

  /** Write `df` z-ordered on n bucketed key columns: range-partition on
    * the z-value into `nFiles` files, sort within, drop the helper
    * column. Each file covers a contiguous z-range = a tile in the
    * n-dim key space; parquet min/max on EVERY key column then prune
    * per-file.
    */
  def zorderWriteN(df: DataFrame, path: String, keyCols: Seq[String],
      bits: Int, nFiles: Int): Unit = {
    val zc = "_graft_z"
    require(!df.columns.contains(zc), s"zorderWriteN: input column $zc is reserved")
    df.withColumn(zc, zValueN(keyCols.map(col), bits))
      .repartitionByRange(nFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }

  /** [[zorderWriteN]] for the common two-column case. */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, nFiles: Int): Unit =
    zorderWriteN(df, path, Seq(colA, colB), bits, nFiles)
}
