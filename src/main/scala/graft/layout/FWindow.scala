package graft.layout

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-interval ordinal windows (SURVEY.md P2/U1; reference
  * layout/FWindow.java:41-120, FInterval.java:31-95): a window is a comma-
  * separated list of half-open intervals `[start..end)` (separators `..`,
  * `-`, `→`; optional brackets; count suffixes like `5M`; a bare count `n`
  * means `[0..n)`). `ALL` is the unbounded window.
  *
  * Spark mapping: the window compiles to an OR of range predicates on the
  * ordinal column (partition/row-group prunable), and logical→physical index
  * translation (CoreXVecVectorDatasetViewMethods.java:389-401) becomes a
  * branch-free CASE over cumulative interval offsets — no global sort.
  */
final case class FInterval(minIncl: Long, maxExcl: Long) {
  def count: Long = maxExcl - minIncl
  def isAll: Boolean = minIncl == -1L && maxExcl == -1L
}

object FInterval {
  private val pattern =
    "^[(\\[]?\\s*([0-9_]+[A-Za-z]*)\\s*(?:(?:\\.\\.|-|→)\\s*([0-9_]+[A-Za-z]*))?\\s*[)\\]]?\\s*$".r

  /** `"[a..b)"` → [a,b); `"n"` → [0,n). */
  def parse(spec: String): FInterval = spec.trim match {
    case pattern(start, null) => FInterval(0L, Units.parseCount(start))
    case pattern(start, end)  => FInterval(Units.parseCount(start), Units.parseCount(end))
    case other => throw new IllegalArgumentException(
      s"invalid interval format: '$other', expected '[start..end)' or 'count'")
  }
}

final case class FWindow(intervals: Seq[FInterval]) {
  def isAll: Boolean = intervals.forall(_.isAll)

  /** Total logical element count (undefined for ALL). */
  def count: Long = intervals.map(_.count).sum

  /** Filter predicate over a physical-ordinal column. */
  def predicate(ordinal: Column): Column =
    if (isAll) lit(true)
    else intervals.map(iv => ordinal >= iv.minIncl && ordinal < iv.maxExcl).reduce(_ || _)

  /** Physical → logical ordinal (position within the window), as a Column:
    * interval j contributes offset Σ_{i<j} count_i.
    */
  def logicalOrdinal(ordinal: Column): Column = {
    if (isAll) return ordinal
    val offsets = intervals.scanLeft(0L)(_ + _.count)
    intervals.zip(offsets).foldLeft(lit(null).cast("long")) { case (acc, (iv, off)) =>
      when(ordinal >= iv.minIncl && ordinal < iv.maxExcl,
        ordinal - iv.minIncl + off).otherwise(acc)
    }
  }

  /** Logical → physical ordinal, driver-side (the reference's
    * resolvePhysicalIndex). Throws on out-of-range.
    */
  def resolvePhysical(logical: Long): Long = {
    if (isAll) return logical
    var remaining = logical
    intervals.foreach { iv =>
      if (remaining < iv.count) return iv.minIncl + remaining
      remaining -= iv.count
    }
    throw new IndexOutOfBoundsException(
      s"logical ordinal $logical outside window of count $count")
  }

  /** Intersection with [lo, hi) bounds — used by scan pushdown. */
  def clamp(lo: Long, hi: Long): FWindow =
    if (isAll) FWindow(Seq(FInterval(lo, hi)))
    else FWindow(intervals
      .map(iv => FInterval(math.max(iv.minIncl, lo), math.min(iv.maxExcl, hi)))
      .filter(_.count > 0))
}

object FWindow {
  val ALL: FWindow = FWindow(Seq(FInterval(-1L, -1L)))

  /** Parse a window spec: comma-separated intervals, optional wrapper
    * brackets; null/empty → ALL.
    */
  def parse(spec: String): FWindow = {
    if (spec == null || spec.trim.isEmpty) return ALL
    val trimmed = spec.trim
    def parseParts(s: String): FWindow =
      FWindow(s.split("\\s*,\\s*").toSeq.map(FInterval.parse))
    try parseParts(trimmed)
    catch {
      case e: IllegalArgumentException
          if trimmed.length > 1 && "[(".contains(trimmed.head) && ")]".contains(trimmed.last) =>
        // one outer bracket pair may wrap the whole interval LIST
        parseParts(trimmed.substring(1, trimmed.length - 1))
    }
  }
}
