package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashMode

/** Bloom-filter benchmark decontamination — the O(mBits)-memory scale path
  * for eval-set screening. [[Dedup.containmentScores]] joins corpus shingles
  * against the bench shingle SET (exact, but the set grows with the union of
  * benchmarks and must broadcast as rows); this folds the bench into a
  * fixed-size bitset once, then scores the corpus with a zero-shuffle
  * map-side membership probe — at 100 TB the screening cost is one corpus
  * scan against a broadcast array whose size the operator PICKS (mBits/8
  * bytes, e.g. 128 MB for a 2³⁰-bit filter), independent of how many
  * benchmark suites are folded in.
  *
  * Determinism is engine-neutral: probe j of a shingle is
  * `md5Hash60(shingle + ":" + j) % mBits` — exactly the SQL
  * `('0x' || substr(md5(shingle || ':' || j), 1, 15))::BIGINT % mBits` —
  * so an oracle replays every membership decision INCLUDING the false
  * positives (a bloom "hit" is all kProbes bits set, whether set by that
  * shingle or by collisions). No RNG, no partition dependence.
  *
  * Shingles are the shared dedup definition: distinct word n-grams over
  * lowercased whitespace tokens (docs with < n tokens score 0, like
  * containmentScores).
  */
object Bloom {

  /** One-pass distributed build: per-partition bitsets OR-merged through a
    * treeAggregate — no shuffle, task state = the mBits/8-byte array. The
    * returned words array is the filter (bit b = word b>>6, bit b&63).
    */
  def build(bench: DataFrame, textCol: String, n: Int = 3,
      mBits: Int = 1 << 20, kProbes: Int = 4,
      mode: HashMode = HashMode.Md5): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(kProbes > 0, s"kProbes must be positive, got $kProbes")
    require(n > 0, s"n must be positive, got $n")
    val spark = bench.sparkSession
    import spark.implicits._
    bench.select(lower(coalesce(col(textCol), lit(""))))
      .as[String].rdd
      .treeAggregate(new Array[Long](mBits / 64))(
        seqOp = { (bits, text) =>
          eachShingle(text, n) { sh =>
            var j = 0
            while (j < kProbes) {
              val pos = (mode.hash60(sh + ":" + j) % mBits).toInt
              bits(pos >> 6) |= 1L << (pos & 63)
              j += 1
            }
          }
          bits
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  /** Per-document bloom containment: the fraction of the doc's distinct
    * shingles whose every probe bit is set in `bits` — (id,
    * bloom_containment), rounded to 6. Zero shuffle: one map pass against
    * the broadcast bitset. Superset-of-exact by construction (no false
    * negatives); the FP excess is the filter-sizing signal.
    */
  def containmentScores(docs: DataFrame, bits: Array[Long], idCol: String,
      textCol: String, n: Int = 3, kProbes: Int = 4,
      mode: HashMode = HashMode.Md5): DataFrame = {
    require(bits.nonEmpty, "empty bloom filter")
    val mBits = bits.length * 64
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bits)
    docs.select(col(idCol).cast("long"), lower(coalesce(col(textCol), lit(""))))
      .as[(Long, String)]
      .map { case (id, text) =>
        val b = bc.value
        var total = 0L
        var hits = 0L
        eachShingle(text, n) { sh =>
          total += 1
          var j = 0
          var allSet = true
          while (allSet && j < kProbes) {
            val pos = (mode.hash60(sh + ":" + j) % mBits).toInt
            allSet = (b(pos >> 6) & (1L << (pos & 63))) != 0L
            j += 1
          }
          if (allSet) hits += 1
        }
        val c = if (total == 0L) 0.0 else hits.toDouble / total
        (id, math.rint(c * 1e6) / 1e6)
      }
      .toDF(idCol, "bloom_containment")
  }

  /** Apply `f` to each DISTINCT word n-gram of the (already lowercased)
    * text — insertion order, the shared shingle definition.
    */
  private def eachShingle(text: String, n: Int)(f: String => Unit): Unit = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length >= n) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sh = toks.slice(i, i + n).mkString(" ")
        if (seen.add(sh)) f(sh)
        i += 1
      }
    }
  }
}
