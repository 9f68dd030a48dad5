package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable 60-bit token hash for the sketch/bucketing family (CMS,
  * Bloom, DSIR, hashed TF, SimHash, window grams). Two modes, one
  * contract: `hash60(s)` (JVM kernel) and `col60(c)` (Column form) are
  * equal row-for-row, land in [0, 2⁶⁰), and are deterministic — so every
  * plan shape and every statistical property is mode-agnostic; ONLY the
  * bucket assignments differ.
  *
  * - [[HashMode.Md5]] — the oracle-parity mode: first 15 hex digits of
  *   md5, replayable in any SQL engine (`('0x' ||
  *   substr(md5(s),1,15))::BIGINT` in DuckDB). This is what every
  *   CORRECTNESS oracle replays byte-for-byte, and the only reason the
  *   mode exists: md5 costs ~an order of magnitude more than a
  *   non-cryptographic hash, a tax measured at ~4 probes/token on the
  *   CMS build (see PLANS.md round-9 soak).
  * - [[HashMode.Xx64]] — the production mode: Spark's own `xxhash64`
  *   (seed 42, codegen'd on the Column side) shifted to 60 bits. The JVM
  *   kernel calls the same catalyst `XXH64` implementation, so kernel and
  *   Column agree exactly. Not SQL-engine-neutral — deployments free of
  *   the oracle-replay contract should run this mode.
  */
sealed trait HashMode {
  /** 60-bit hash of `s` in [0, 2⁶⁰) — the typed-kernel form. */
  def hash60(s: String): Long
  /** Column form; equal to [[hash60]] on every row. */
  def col60(c: Column): Column
  def name: String

  /** 60-bit hash of every length-`l` code-point window of `cps` (index i
    * = window starting at code point i; empty if shorter than `l`). Each
    * element equals `hash60` of that window's string. Default: one
    * kernel call per window — O(len·l) hash work; [[HashMode.Poly]]
    * overrides with the O(len) rolling recurrence.
    */
  def windowHash60(cps: Array[Int], l: Int): Array[Long] = {
    require(l > 0, s"window length must be positive, got $l")
    val n = cps.length - l + 1
    if (n <= 0) Array.emptyLongArray
    else Array.tabulate(n)(i => hash60(new String(cps, i, l)))
  }
}

object HashMode {

  case object Md5 extends HashMode {
    def hash60(s: String): Long = StableHash.md5Hash60(s)
    def col60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val name = "md5"
    /** One UTF-8 encode for the whole array + per-window byte-slice md5 —
      * hash values identical to the default (same bytes), no per-window
      * String/byte[] churn (the every-position ExactSubstr path).
      */
    override def windowHash60(cps: Array[Int], l: Int): Array[Long] = {
      require(l > 0, s"window length must be positive, got $l")
      StableHash.md5Window60(cps, l)
    }
  }

  case object Xx64 extends HashMode {
    def hash60(s: String): Long = StableHash.xx64(s) >>> 4
    def col60(c: Column): Column = shiftrightunsigned(xxhash64(c), 4)
    val name = "xx64"
  }

  /** Rolling-window production mode: the Rabin–Karp code-point
    * polynomial ([[PolyHash]]). Same per-string cost class as xx64, but
    * its [[windowHash60]] is O(len) instead of O(len·l) — the mode for
    * every-position window kernels (char-level ExactSubstr). Column form
    * is the codegen'd `poly_hash60` expression, so kernel and Column
    * agree exactly.
    */
  case object Poly extends HashMode {
    def hash60(s: String): Long = PolyHash.hash60(s)
    def col60(c: Column): Column =
      org.apache.spark.sql.graftbridge.Bridge.column(
        PolyHash60(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
    val name = "poly"
    override def windowHash60(cps: Array[Int], l: Int): Array[Long] =
      PolyHash.windowHashes60(cps, l)
  }

  def parse(s: String): HashMode = s.toLowerCase match {
    case "md5" => Md5
    case "xx64" | "xxhash64" | "xx" => Xx64
    case "poly" | "rolling" => Poly
    case other =>
      throw new IllegalArgumentException(
        s"unknown hash mode: $other (md5|xx64|poly)")
  }
}
