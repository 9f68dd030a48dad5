package graft.layout

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashMode

/** Rendezvous (highest-random-weight) sharding — STABLE doc→shard
  * assignment for incremental corpus layout: when the shard count grows
  * N→M, only the docs whose argmax lands on a NEW shard move (expected
  * (M−N)/M of them), versus `id % N` sharding where almost everything
  * moves. At 100 TB "reshard" is a data migration; HRW makes its size
  * proportional to the growth, not the corpus.
  *
  * shard(id) = argmax over s ∈ [0, nShards) of hash60(id + ":" + s); ties
  * break to the larger shard index (deterministic, and md5-mode replays in
  * any SQL engine — the [[graft.functions.HashMode]] discipline).
  *
  * Scale shape: pure per-row Column arithmetic (one nShards-element
  * higher-order transform + array_max), no shuffle, codegen-friendly;
  * a repartition BY the shard column is the materialization step and is
  * the only data movement.
  */
object Sharding {

  /** Input columns + `shard` (long in [0, nShards)). Cost is O(nShards)
    * PER ROW (the argmax transform materializes one struct per shard), so
    * the operator is bounded to the file/bucket-count regime it exists
    * for; a layout needing ≥ 64k shards should use jump consistent
    * hashing (O(log n) per key) instead — rejected loudly here rather
    * than silently burning nShards·rows work.
    */
  def rendezvousAssign(df: DataFrame, idCol: String, nShards: Int,
      mode: HashMode = HashMode.Md5): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(nShards <= 65536,
      s"rendezvousAssign is O(nShards) per row — $nShards shards is past " +
        "the file/bucket regime; use jump consistent hashing for that scale")
    // struct comparison is lexicographic (h, then shard): max = highest
    // hash, ties to the larger shard index
    val best = array_max(transform(sequence(lit(0), lit(nShards - 1)),
      s => struct(
        mode.col60(concat(col(idCol).cast("string"), lit(":"),
          s.cast("string"))).as("h"),
        s.cast("long").as("shard"))))
    df.withColumn("shard", best.getField("shard"))
  }

  /** Jump consistent hashing (the Lamping–Veach algorithm) — the
    * large-n complement [[rendezvousAssign]]'s guard points at: O(log n)
    * per key and O(1) memory at ANY shard count, with the same stability
    * contract (growing n→m moves each key with probability (m−n)/m, and
    * ONLY onto the new shards). The kernel is 64-bit LCG arithmetic with
    * wrapping multiplication — not replayable in an ANSI SQL engine, so
    * this operator is SPEC-verified (balance, stability, never
    * old→old — ShardingSpec) rather than DuckDB-oracled; [[
    * rendezvousAssign]] is the oracle-carrying twin of the family.
    */
  def jumpAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val n = nShards
    // same output contract as rendezvousAssign: input columns + shard.
    // A scalar UDF (not codegen'd) is acceptable here: the kernel is
    // O(log n) integer arithmetic per row, and decorating in place avoids
    // the join-back shuffle a (id, shard)-only projection would force on
    // every downstream consumer that needs its payload columns.
    val kernel = udf((id: Long) => jumpKernel(id, n))
    df.withColumn("shard", kernel(col(idCol).cast("long")))
  }

  /** The jump-hash kernel: deterministic per (key, n). Operand order
    * matches the canonical Lamping–Veach formulation —
    * `(b+1) * (2^31 / ((key>>>33) + 1))`, the divide FIRST — so
    * assignments agree bit-for-bit with external jump-consistent-hash
    * implementations (the fp rounding of multiply-then-divide can differ).
    */
  private[layout] def jumpKernel(key: Long, n: Int): Long = {
    var k = key
    var b = -1L
    var j = 0L
    while (j < n) {
      b = j
      k = k * 2862933555777941757L + 1L
      j = ((b + 1).toDouble *
        ((1L << 31).toDouble / ((k >>> 33) + 1).toDouble)).toLong
    }
    b
  }

  /** Jump-hash twin of [[reshardStabilityCard]] for the shard-count
    * regime HRW's guard refuses (e.g. 1M shards): per growth
    * `fromShards` → `toShards`, the moved count/fraction beside the
    * analytic expectation (M−N)/M, plus `moved_old_to_old` — the count of
    * keys that moved between two SURVIVING shards, which jump consistent
    * hashing guarantees is zero on growth. One pass, no join: both
    * assignments come from a single kernel evaluation per row.
    * SPEC-verified (ShardingSpec; the kernel is not ANSI-SQL replayable —
    * [[reshardStabilityCard]] is the oracle-carrying twin).
    */
  def jumpStabilityCard(df: DataFrame, idCol: String, fromShards: Int,
      toShards: Int): DataFrame = {
    require(fromShards > 0 && toShards > 0,
      s"shard counts must be positive: $fromShards -> $toShards")
    val (n0, n1) = (fromShards, toShards)
    val both = udf((id: Long) => (jumpKernel(id, n0), jumpKernel(id, n1)))
    df.select(both(col(idCol).cast("long")).as("s"))
      .select(col("s._1").as("s_from"), col("s._2").as("s_to"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_from") =!= col("s_to"), 1L).otherwise(0L)).as("moved"),
        sum(when(col("s_from") =!= col("s_to") &&
          col("s_to") < math.min(n0, n1), 1L).otherwise(0L))
          .as("moved_old_to_old"))
      .select(lit("jump").as("policy"), col("n_docs"), col("moved"),
        round(col("moved").cast("double") / col("n_docs"), 6).as("moved_frac"),
        (if (toShards > fromShards)
           round(lit((toShards - fromShards).toDouble / toShards), 6)
         else lit(null).cast("double")).as("expected_frac"),
        col("moved_old_to_old"))
  }

  /** Resharding stability card, `fromShards` → `toShards`: per policy
    * (`hrw`, `modulo`), how many docs MOVE and the fraction, beside the
    * analytic HRW expectation (M−N)/M for growth (null when shrinking —
    * the argmax-removal distribution is not uniform). The modulo row is
    * the baseline that shows why naive sharding cannot be grown in place.
    */
  def reshardStabilityCard(df: DataFrame, idCol: String, fromShards: Int,
      toShards: Int, mode: HashMode = HashMode.Md5): DataFrame = {
    require(fromShards > 0 && toShards > 0,
      s"shard counts must be positive: $fromShards -> $toShards")
    val ids = df.select(col(idCol))
    val hrw = rendezvousAssign(ids, idCol, fromShards, mode)
      .withColumnRenamed("shard", "s_from")
      .join(rendezvousAssign(ids, idCol, toShards, mode)
        .withColumnRenamed("shard", "s_to"), Seq(idCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_from") =!= col("s_to"), 1L).otherwise(0L)).as("moved"))
      .select(lit("hrw").as("policy"), col("n_docs"), col("moved"),
        round(col("moved").cast("double") / col("n_docs"), 6).as("moved_frac"),
        (if (toShards > fromShards)
           round(lit((toShards - fromShards).toDouble / toShards), 6)
         else lit(null).cast("double")).as("expected_frac"))
    val modulo = ids
      .agg(count(lit(1)).as("n_docs"),
        sum(when(pmod(col(idCol), lit(fromShards)) =!=
          pmod(col(idCol), lit(toShards)), 1L).otherwise(0L)).as("moved"))
      .select(lit("modulo").as("policy"), col("n_docs"), col("moved"),
        round(col("moved").cast("double") / col("n_docs"), 6).as("moved_frac"),
        lit(null).cast("double").as("expected_frac"))
    hrw.unionAll(modulo)
  }
}
