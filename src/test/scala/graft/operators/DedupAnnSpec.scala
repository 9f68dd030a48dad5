package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different text about spark engines here"),
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
    (4L, "short text")).toDF("doc_id", "text")

  test("wordShingles produces overlapping n-grams; short docs yield none") {
    val sh = docs.select(col("doc_id"), TextFunctions.wordShingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(0L).head == "the quick brown" && sh(0L).size == 7)
    assert(sh(4L).isEmpty)
  }

  test("dedupPipeline cascades: exact dup, then near-dup among survivors") {
    val out = Dedup.dedupPipeline(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == (("kept", 0L)))
    assert(out(3L) == (("exact_dup", 0L)))  // identical text, higher id
    assert(out(1L) == (("near_dup", 0L)))   // one word differs, survivor stage
    assert(out(2L) == (("kept", 2L)))
    assert(out(4L) == (("kept", 4L)))       // too short for shingles
  }

  test("dedupPipeline keeps a row for every input id, including null text") {
    val withNulls = docs.unionByName(
      Seq((5L, null: String), (6L, null: String)).toDF("doc_id", "text"))
    val out = Dedup.dedupPipeline(withNulls, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    // null-text docs are exact duplicates of each other
    assert(out(5L) == (("kept", 5L)))
    assert(out(6L) == (("exact_dup", 5L)))
  }

  test("exactGroups collapses exact duplicates to the lowest id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").filter(col("multiplicity") > 1).collect()
    assert(g.length == 1 && g(0).getAs[Long]("canonical_id") == 0L &&
      g(0).getAs[Long]("multiplicity") == 2L)
  }

  test("ngramJaccardPairs finds near and exact dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 3L))) // exact: jaccard 1.0
    assert(keys.contains((0L, 1L)) && keys.contains((1L, 3L))) // near
    assert(!keys.exists(p => p._1 == 2L || p._2 == 2L))
    assert(pairs.find(p => (p._1, p._2) == (0L, 3L)).get._3 == 1.0)
  }

  test("minhashLshPairs agrees with exact jaccard pairs at high threshold") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("simhash: identical docs share the hash; near-dups are close in Hamming") {
    val sims = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) == sims(3L))
    val ham01 = java.lang.Long.bitCount(sims(0L) ^ sims(1L))
    val ham02 = java.lang.Long.bitCount(sims(0L) ^ sims(2L))
    assert(ham01 < ham02, s"near-dup hamming $ham01 should beat unrelated $ham02")
  }

  test("simhashNearDupPairs matches brute force on a random corpus") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val corpus = (0L until 60L).map { i =>
      val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, if (i % 3 == 0 && i > 0) null else base) // some docs reuse others below
    }.map { case (i, t) => (i, Option(t).getOrElse(s"alpha beta gamma delta eps zeta eta theta plus$i")) }
      .toDF("doc_id", "text")
    val sims = Dedup.simhash(corpus, "doc_id", "text").cache()
    val banded = Dedup.simhashNearDupPairs(sims, maxHamming = 8, chunks = 12, bits = 60)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = sims.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 8
    } yield (ia, ib)).toSet
    assert(banded == brute)
  }

  test("IVF search equals exact KNN when probing every cell") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val queries = emb.filter(col("vec_id") < 5)
    val index = Ann.ivfIndex(emb, centroids)
    val ivf = Ann.ivfSearch(queries, index, centroids, k = 5, nProbe = 8, excludeSelf = true)
      .select("query_id", "neighbor_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Knn.knn(queries, emb, k = 5, excludeSelf = true)
      .select("query_id", "neighbor_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact)
  }

  test("IVF index is a partition of the base set") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val index = Ann.ivfIndex(emb, emb.filter(col("vec_id") < 8)).cache()
    assert(index.count() == emb.count())
    assert(index.select("id").distinct().count() == emb.count())
    assert(index.select("cell").distinct().count() <= 8)
  }

  test("edit-verified near-dup keeps near-identical pairs, rejects permutations") {
    val head = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, head),
      (2L, head.replace("delta", "felta")),          // 1 char edit
      (3L, head.split(" ").reverse.mkString(" ")),   // same words, permuted
      (4L, "totally unrelated content nothing shared here at all"))
      .toDF("doc_id", "text")
    val got = Dedup.editVerifiedNearDupPairs(docs, "doc_id", "text",
        n = 3, candidateThreshold = 0.05, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // (1,2) survives with distance 1; the permuted doc 3 shares unigrams
    // but its 3-gram Jaccard and its edit distance both reject it
    assert(got == Set((1L, 2L, 1L)))
    // the permutation IS within reach of a very loose candidate threshold +
    // huge maxDist — proving the verify (not candidate recall) rejected it
    val loose = Dedup.editVerifiedNearDupPairs(docs, "doc_id", "text",
        n = 1, candidateThreshold = 0.5, maxDist = 1000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((1L, 3L)))
    val tight = Dedup.editVerifiedNearDupPairs(docs, "doc_id", "text",
        n = 1, candidateThreshold = 0.5, maxDist = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!tight.contains((1L, 3L)) && tight.contains((1L, 2L)))
  }

  test("incremental LSH == batch pairs touching the new batch (exact union invariant)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = canon(Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numPerms = 128, bands = 32, threshold = 0.8))
    val isNew = pmod(col("doc_id"), lit(5)) === 0
    val oldPairs = canon(Dedup.minhashLshPairs(docs.filter(!isNew),
      "doc_id", "text", n = 3, numPerms = 128, bands = 32, threshold = 0.8))
    val oldIdx = Dedup.minhashIndex(docs.filter(!isNew), "doc_id", "text")
    val newIdx = Dedup.minhashIndex(docs.filter(isNew), "doc_id", "text")
    val inc = canon(Dedup.minhashLshPairsIncremental(oldIdx, newIdx,
      numPerms = 128, bands = 32, threshold = 0.8))
    assert(oldPairs.union(inc) == full, "old ∪ incremental != full-corpus pairs")
    assert(oldPairs.intersect(inc).isEmpty, "incremental re-emitted an indexed pair")
    assert(inc.nonEmpty, "vacuous: no pair touches the new batch at sf0.001")
  }

  test("minhashLshPairs bucketCap: a mass-duplicate cluster is excluded " +
      "from candidate generation; distinct near-dups still pair") {
    // 300 EXACT copies of one text (every band bucket holds all 300 —
    // the quadratic-bucket trap: ~45k candidate pairs × 32 bands) plus
    // one genuine near-dup pair outside the cluster
    val boiler = (100L until 400L).map(i =>
      (i, "standard license header text repeated across the whole corpus"))
    // one-token edit in a 28-token doc -> jaccard ~0.89, caught by
    // 32x4 banding with p ~ 1 - (1-0.89^4)^32 ~ 1-3e-10 (not flaky)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one %s"
    val near = Seq(
      (1L, base.format("two")),
      (2L, base.format("three")))
    val corpus = (boiler ++ near).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        threshold = 0.5, bucketCap = 50)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)),
      s"cluster dropped, near pair kept: ${capped.take(5)}")
    // the exact-dup cluster remains the EXACT pass's job, cap-independent
    val groups = Dedup.exactGroups(corpus, "doc_id", "text")
      .filter(col("multiplicity") > 1).collect()
    assert(groups.length == 1 &&
      groups.head.getAs[Long]("multiplicity") == 300L)
    // incremental form honors the same cap over the corpus-wide bucket df
    val isNew = col("doc_id") >= 390 || col("doc_id") <= 2
    val oldIdx = Dedup.minhashIndex(corpus.filter(!isNew), "doc_id", "text")
    val newIdx = Dedup.minhashIndex(corpus.filter(isNew), "doc_id", "text")
    val inc = Dedup.minhashLshPairsIncremental(oldIdx, newIdx,
        threshold = 0.5, bucketCap = 50)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == Set((1L, 2L)), s"incremental cap: ${inc.take(5)}")
  }

  test("embeddingNearDupPairsBucketed bucketCap: stacked identical vectors " +
      "stop flooding one bucket; distinct near pair survives") {
    // 200 identical zero-ish vectors collide in ONE bucket of every table
    // regardless of nBits; a planted near pair sits elsewhere
    val stack = (100L until 300L).map(i => (i, Array.fill(8)(0.001f)))
    val near = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0.99f, 0.05f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val embs = (stack ++ near).toDF("id", "vec")
    val capped = Dedup.embeddingNearDupPairsBucketed(embs, "id", "vec",
        threshold = 0.95, bucketCap = 50)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"stack excluded, near pair kept: ${capped.take(5)}")
    // uncapped, the stack floods the candidate space (and all verify at
    // cosine 1.0) — the behavior the cap exists to bound
    val uncapped = Dedup.embeddingNearDupPairsBucketed(embs, "id", "vec",
      threshold = 0.95).count()
    assert(uncapped > 10000, s"uncapped baseline is bucket-quadratic: $uncapped")
  }
}
