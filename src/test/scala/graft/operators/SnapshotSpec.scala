package graft.operators

import graft.SparkSpec

/** Snapshot diff: the four statuses on a hand-built pair of versions, the
  * card's zero-kept totality, and identity (diff of a corpus with itself).
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val oldV = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
  private val newV = Seq(
    (1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta")).toDF("doc_id", "text")

  test("per-id statuses: added/removed/changed/unchanged") {
    val got = Snapshot.diff(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("card keeps zero statuses (total over the four)") {
    val got = Snapshot.diffCard(oldV, oldV, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 0L, "removed" -> 0L,
      "changed" -> 0L, "unchanged" -> 3L))
  }

  test("a null text on one side is a content CHANGE (null-safe hash compare)") {
    val o = Seq((1L, Some("alpha")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(o, n, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("bootstrap CI: degenerate one-length corpus collapses to the mean; corpus CI brackets it") {
    // all docs the same length: every replicate mean IS that length
    val flat = (0L until 50L).map(i => (i, "aaaa")).toDF("doc_id", "text")
    val r = Describe.bootstrapMeanChars(flat, "doc_id", "text").collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2)) == ((4.0, 4.0, 4.0)))

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val c = Describe.bootstrapMeanChars(docs, "doc_id", "text").collect()(0)
    assert(c.getDouble(1) <= c.getDouble(0) && c.getDouble(0) <= c.getDouble(2),
      s"CI must bracket the mean: $c")
    assert(c.getDouble(1) < c.getDouble(2)) // genuine spread on real lengths
    // deterministic: a second run is identical
    val c2 = Describe.bootstrapMeanChars(docs, "doc_id", "text").collect()(0)
    assert(c.toSeq == c2.toSeq)
  }

  test("self-diff is all-unchanged at corpus scale") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val statuses = Snapshot.diff(docs, docs, "doc_id", "text")
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("unchanged"))
  }
}
