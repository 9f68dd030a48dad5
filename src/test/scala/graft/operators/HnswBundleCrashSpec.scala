package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Takedown discipline for persisted HNSW bundles — the `Ann` bundle
  * crash story (ANodeSpec's injection pattern) verified at the graph
  * layer: tombstones hide immediately WITHOUT touching any graph (cell
  * connectivity — the saturated-beam theorem — survives, so results
  * equal a from-scratch rebuild over the survivors), compaction rebuilds
  * affected cells and swaps generations, and a crash injected after
  * EVERY swap step leaves a bundle that reads correctly and converges
  * under a rerun.
  */
class HnswBundleCrashSpec extends SparkSpec {

  private lazy val emb =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
  private lazy val centroids = emb.filter(col("vec_id") < 8)
  private lazy val q = emb.filter(col("vec_id") < 3)

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  // truth: saturated search over a from-scratch graph build WITHOUT the
  // removed rows — what every post-delete read must equal
  private lazy val want = key(Hnsw.hnswSearch(q,
    Hnsw.hnswIndex(emb.filter(col("vec_id") % 5 =!= 4), centroids), centroids,
    k = 4, nProbe = 3, ef = 1 << 20, excludeSelf = true))

  private def freshBundle(): String = {
    val p = s"target/hnsw-tomb-${System.nanoTime()}"
    Hnsw.writeBundle(Hnsw.hnswIndex(emb, centroids), centroids, p)
    Hnsw.tombstoneFromBundle(emb.filter(col("vec_id") % 5 === 4), p)
    p
  }

  private def search(p: String) =
    key(Hnsw.searchBundle(q, p, k = 4, nProbe = 3, ef = 1 << 20,
      excludeSelf = true))

  test("tombstones hide immediately without touching any graph file") {
    val p = freshBundle()
    val total = emb.count()
    // no cell partition was rewritten — the graphs still hold every row
    assert(spark.read.parquet(s"$p/cells").count() == total)
    assert(search(p) == want)
  }

  test("compact reclaims tombstones; results unchanged") {
    val p = freshBundle()
    val expectLive = emb.filter(col("vec_id") % 5 =!= 4).count()
    Hnsw.compactBundle(spark, p)
    assert(!new java.io.File(s"$p/tombstones").exists())
    assert(spark.read.parquet(s"$p/cells").count() == expectLive)
    assert(search(p) == want)
  }

  test("crash injected after every swap step: reads recover, rerun converges") {
    val expectLive = emb.filter(col("vec_id") % 5 =!= 4).count()
    for (step <- 1 to 4) {
      val p = freshBundle()
      intercept[RuntimeException] {
        Hnsw.compactBundleWithFailpoint(spark, p, step)
      }
      assert(search(p) == want, s"read after crash at step $step")
      if (step >= 2) {
        // past step 2 the post-compact generation is (or becomes, via
        // recovery) live, so the spent tombstones must have been retired
        // by the read above — a re-appended previously-tombstoned id
        // must never be silently hidden
        assert(!new java.io.File(s"$p/tombstones").exists(),
          s"step $step: spent tombstones survived recovery")
      }
      Hnsw.compactBundle(spark, p) // rerun completes
      assert(!new java.io.File(s"$p/tombstones").exists(), s"step $step rerun")
      assert(spark.read.parquet(s"$p/cells").count() == expectLive,
        s"step $step rerun")
      assert(search(p) == want, s"post-compact after crash at step $step")
    }
  }

  test("compacting a tombstone-free bundle is a no-op rewrite") {
    val p = s"target/hnsw-clean-${System.nanoTime()}"
    Hnsw.writeBundle(Hnsw.hnswIndex(emb, centroids), centroids, p)
    val before = key(Hnsw.searchBundle(q, p, k = 4, nProbe = 3,
      ef = 1 << 20, excludeSelf = true))
    Hnsw.compactBundle(spark, p)
    assert(key(Hnsw.searchBundle(q, p, k = 4, nProbe = 3, ef = 1 << 20,
      excludeSelf = true)) == before)
  }
}
