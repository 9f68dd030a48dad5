package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Hnsw

/** Graph-ANN queries. The beam search itself is SQL-replayable only in
  * its saturated form: with ef >= |cell| the beam provably explores the
  * whole (connected — the prune invariant keeps a lower-index edge per
  * node) cell graph, so its top-k EQUALS the exhaustive scan over the
  * probed cells — which is exactly the q50 oracle shape. A green row
  * therefore hash-checks the full pipeline: cell routing, graph
  * construction/storage, beam traversal (visit discipline, heap ties)
  * and ranking. The sub-exhaustive regime (small ef → <10% of the
  * distance evaluations at recall >= 0.9) is pinned by HnswSpec against
  * brute-force truth, the learned-path convention (cf. Opq).
  */
object HnswQueries {

  private def duckCosDist(a: String, b: String): String =
    s"""(1.0 - (list_sum(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       | / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE*x::DOUBLE)))
       |  * sqrt(list_sum(list_transform($b, x -> x::DOUBLE*x::DOUBLE))))))""".stripMargin

  def all: Seq[GQuery] = Seq(

    // Saturated-beam HNSW == exhaustive-within-probed-cells (the q50 IVF
    // oracle replayed against the graph path): deterministic 16-cell
    // quantizer, nProbe=4, k=5, ef far above any cell size.
    GQuery(
      "q304_hnsw_saturated",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
         |assignr AS (
         |  SELECT base.id, base.v, c.cell, ${duckCosDist("base.v", "c.ce")} AS d,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${duckCosDist("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, v, cell FROM assignr WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, q.qv, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${duckCosDist("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, qv, cell FROM probr WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid, ${duckCosDist("p.qv", "a.v")} AS d
         |  FROM probes p JOIN assign a ON a.cell = p.cell
         |  WHERE a.id <> p.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      val index = Hnsw.hnswIndex(emb, centroids, m = 8, efConstruction = 32)
      Hnsw.hnswSearch(queries, index, centroids, k = 5, nProbe = 4,
          ef = 1 << 20, excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // FILTERED saturated beam == filtered exhaustive over probed cells:
    // the q228 per-query wire-predicate cycle (label IN set / label >= 5 /
    // unfiltered) pushed through the graph path. Traversal walks the whole
    // connected cell graph; only eligible nodes enter the result heap, so
    // the q228/q263 oracle replays it exactly — predicate semantics, beam
    // admission and ranking checked together.
    GQuery(
      "q305_hnsw_filtered",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v, label FROM embeddings),
         |assignr AS (
         |  SELECT base.id, base.v, base.label, c.cell,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${duckCosDist("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, v, label, cell FROM assignr WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, q.qv, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${duckCosDist("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, qv, cell FROM probr WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid, ${duckCosDist("p.qv", "a.v")} AS d
         |  FROM probes p JOIN assign a ON a.cell = p.cell
         |  WHERE a.id <> p.qid
         |    AND CASE p.qid % 3
         |          WHEN 0 THEN a.label IN (0, 1, 2, 3)
         |          WHEN 1 THEN a.label >= 5
         |          ELSE TRUE END)
         |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      import graft.predicates._
      import graft.predicates.Comparand.IntVal
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      def tree(mod: Long): PNode = mod match {
        case 0 => PredicateNode.namedTyped("label", OpType.IN,
          IntVal(0), IntVal(1), IntVal(2), IntVal(3))
        case 1 => PredicateNode.namedTyped("label", OpType.GE, IntVal(5))
        case _ => ConjugateNode.and()
      }
      val blobUdf = udf((qid: Long) =>
        PNodeCodec.encodeFramed(tree(qid % 3), PNodeCodec.Mode.NamedTyped))
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
        .withColumn("predicate", blobUdf(col("vec_id")))
      val index = Hnsw.hnswIndexWithMeta(emb, centroids, m = 8,
        efConstruction = 32, metaCols = Seq("label"))
      Hnsw.hnswSearchFiltered(queries, index, centroids, k = 5, nProbe = 4,
          ef = 1 << 20, excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // Streaming ingest feeding an ORACLED search: the bundle seeds with
    // the first 300 vectors, the rest arrive as a 2-file stream
    // (StreamHnsw.appendToBundle — affected cells rebuild per batch,
    // exactly-once effect), and the saturated search over the final
    // bundle must match the q304 SQL replay over the WHOLE corpus — the
    // only way that holds is if the ingest left the graphs identical to
    // a from-scratch build.
    GQuery(
      "q308_hnsw_stream_ingest",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
         |assignr AS (
         |  SELECT base.id, base.v, c.cell, ${duckCosDist("base.v", "c.ce")} AS d,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${duckCosDist("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, v, cell FROM assignr WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, q.qv, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${duckCosDist("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, qv, cell FROM probr WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid, ${duckCosDist("p.qv", "a.v")} AS d
         |  FROM probes p JOIN assign a ON a.cell = p.cell
         |  WHERE a.id <> p.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      val base = s"${tmpDir()}/hnsw-ing-${System.nanoTime()}"
      val bundle = s"$base/bundle"
      graft.operators.Hnsw.writeBundle(
        Hnsw.hnswIndex(emb.filter(col("vec_id") < 300), centroids,
          m = 8, efConstruction = 32),
        centroids, bundle)
      val inDir = s"$base/in"
      emb.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$inDir/w1")
      emb.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$inDir/w2")
      val stream = s.readStream.schema(emb.select("vec_id", "embedding").schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(inDir)
        .select("vec_id", "embedding")
      graft.streaming.StreamHnsw.appendToBundle(stream, bundle,
        m = 8, efConstruction = 32)
      Hnsw.searchBundle(queries, bundle, k = 5, nProbe = 4, ef = 1 << 20,
          excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // Tombstone-first takedown at rest (Hnsw.tombstoneFromBundle): ids
    // hide IMMEDIATELY — no graph file rewritten — because tombstoned
    // nodes stay walkable and only drop out of the result heap, so the
    // saturated beam still provably equals the exhaustive scan over the
    // SURVIVING rows of the probed cells. The oracle replays exactly
    // that: the q304 shape with the removed ids filtered from the
    // candidate set. HnswBundleCrashSpec separately injects crashes into
    // the compaction that reclaims these tombstones.
    GQuery(
      "q334_hnsw_tombstone",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
         |assignr AS (
         |  SELECT base.id, base.v, c.cell, ${duckCosDist("base.v", "c.ce")} AS d,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${duckCosDist("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, v, cell FROM assignr WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, q.qv, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${duckCosDist("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, qv, cell FROM probr WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid, ${duckCosDist("p.qv", "a.v")} AS d
         |  FROM probes p JOIN assign a ON a.cell = p.cell
         |  WHERE a.id <> p.qid AND a.id % 5 <> 4)
         |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      val bundle = s"${tmpDir()}/hnsw-tomb-${System.nanoTime()}"
      Hnsw.writeBundle(
        Hnsw.hnswIndex(emb, centroids, m = 8, efConstruction = 32),
        centroids, bundle)
      Hnsw.tombstoneFromBundle(emb.filter(col("vec_id") % 5 === 4), bundle)
      Hnsw.searchBundle(queries, bundle, k = 5, nProbe = 4, ef = 1 << 20,
          excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // ef-sweep calibration card (Hnsw.efRecallCurve): the artifact a
    // serving deployment reads before fixing ef. Oracle discipline =
    // q304's rule — the SATURATED point is replayed EXACTLY (recall 1.0
    // by the connectivity theorem, and its distance-evaluation fraction
    // equals the probed-cell mass, which DuckDB recomputes from the
    // assignment: the saturated beam visits every probed-cell node
    // exactly once, counted by the kernel accumulator). The measured
    // sub-saturated rows sit beside it with theorem-backed bound columns:
    // evals(ef) <= evals(saturated) holds per (query, cell) by the
    // visit-once bitset, and generous recall floors (≥2x margin at
    // sf0.01, HnswSpec pins tighter ones on its fixture) catch a beam
    // regression without pinning float noise.
    GQuery(
      "q333_hnsw_ef_card",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
         |assignr AS (
         |  SELECT base.id, c.cell,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${duckCosDist("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, cell FROM assignr WHERE rn = 1),
         |csize AS (SELECT cell, count(*) AS n FROM assign GROUP BY cell),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${duckCosDist("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, cell FROM probr WHERE rn <= 4),
         |ev AS (SELECT sum(coalesce(cs.n, 0))::DOUBLE AS evals,
         |              count(DISTINCT p.qid)::DOUBLE AS nq
         |       FROM probes p LEFT JOIN csize cs ON cs.cell = p.cell),
         |nb AS (SELECT count(*)::DOUBLE AS nbase FROM base)
         |SELECT 8::BIGINT AS ef, false AS saturated, NULL::DOUBLE AS recall,
         |       NULL::DOUBLE AS evals_frac, true AS recall_floor_ok,
         |       true AS evals_le_saturated
         |UNION ALL SELECT 16, false, NULL, NULL, true, true
         |UNION ALL SELECT 64, false, NULL, NULL, true, true
         |UNION ALL
         |SELECT 1048576, true, 1.0,
         |       (SELECT round(evals / (nq * nbase), 6) FROM ev, nb),
         |       true, true""".stripMargin) { (s, dir) =>
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      val index = Hnsw.hnswIndex(emb, centroids, m = 8, efConstruction = 32)
      val satEf = 1 << 20
      val floors = Map(8 -> 0.3, 16 -> 0.45, 64 -> 0.6, satEf -> 1.0)
      val card = Hnsw.efRecallCurve(queries, index, centroids, k = 5,
          nProbe = 4, efs = Seq(8, 16, 64, satEf), excludeSelf = true)
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      val satEvals = card.find(_._1 == satEf).get._3
      card.map { case (ef, recall, evals) =>
        (ef.toLong, ef == satEf,
          if (ef == satEf) Some(recall) else None,
          if (ef == satEf) Some(evals) else None,
          recall >= floors(ef),
          evals <= satEvals * (1 + 1e-9))
      }.toSeq
        .toDF("ef", "saturated", "recall", "evals_frac",
          "recall_floor_ok", "evals_le_saturated")
        .select(col("ef"), col("saturated"), round(col("recall"), 6).as("recall"),
          round(col("evals_frac"), 6).as("evals_frac"),
          col("recall_floor_ok"), col("evals_le_saturated"))
    })
}
