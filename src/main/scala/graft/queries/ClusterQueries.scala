package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Clustering

/** Deterministic k-means clustering queries over the embeddings table:
  * nearest-centroid assignment, cluster-balanced subsampling, and the Lloyd
  * mean-update step — each proven engine-neutrally (the oracle replays the
  * argmin, the per-cell top-k and the per-dim mean from first principles).
  * Multi-iteration convergence is spec territory (ClusteringSpec proves
  * parity with a sequential reference); the oracles pin the two primitive
  * steps every iteration is made of.
  */
object ClusterQueries {

  /** Squared L2 between two DuckDB float lists, accumulated in double in
    * index order — same order as DistanceKernels.computeArrays(EUCLIDEAN)
    * (sqrt omitted: argmin-invariant).
    */
  private def duckL2Sq(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |  i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE)))""".stripMargin

  /** Cosine distance between two DuckDB float lists, f64 accumulation in
    * index order — same as DistanceKernels.computeArrays(COSINE).
    */
  private def duckCosDist(a: String, b: String): String =
    s"""(1.0 - (list_sum(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       | / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE*x::DOUBLE)))
       |  * sqrt(list_sum(list_transform($b, x -> x::DOUBLE*x::DOUBLE))))))""".stripMargin

  /** The k=8 lowest-id embeddings as cells 0..7 (lloyd's deterministic
    * init), and the argmin assignment with the lowest-cell tie rule.
    */
  /** One-step Lloyd replay over the CTE `corpus(vec_id, embedding)`:
    * init = the 8 lowest-id rows as cells 0..7, E-step argmin with the
    * lowest-cell tie rule, M-step round(avg,6)::FLOAT (the engine's q135
    * float32-centroid convention). Emits `${p}tc(cell, ce)`; cells that
    * received no assignments drop (lloyd's n_points>0 filter).
    */
  private def lloydTrainCte(corpus: String, p: String): String =
    s"""${p}i AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
       |      FROM (SELECT * FROM $corpus ORDER BY vec_id LIMIT 8)),
       |${p}r AS (SELECT e.vec_id, e.embedding AS v, i.cell,
       |             row_number() OVER (PARTITION BY e.vec_id
       |                                ORDER BY ${duckL2Sq("e.embedding", "i.ce")}, i.cell) AS rn
       |      FROM $corpus e CROSS JOIN ${p}i i),
       |${p}a AS (SELECT vec_id, v, cell FROM ${p}r WHERE rn = 1),
       |${p}m AS (SELECT cell, generate_subscripts(v, 1) - 1 AS idx, unnest(v)::DOUBLE AS x
       |      FROM ${p}a),
       |${p}cm AS (SELECT cell, idx, round(avg(x), 6)::FLOAT AS cv
       |      FROM ${p}m GROUP BY cell, idx),
       |${p}tc AS (SELECT cell, list(cv ORDER BY idx) AS ce FROM ${p}cm GROUP BY cell)""".stripMargin

  /** Staleness-card evaluation for the trained centroids `${p}tc`: assign
    * the current corpus `v2`, probe 2 cells per query from `q`, take top-5
    * within them, count hits against the exact truth `ex`, and measure the
    * fullest cell. Emits `${p}h(hits)` and `${p}occ(max_n)`.
    */
  private def stalenessEvalCte(p: String): String =
    s"""${p}ar AS (SELECT b.vec_id AS id, b.embedding AS v, t.cell,
       |         row_number() OVER (PARTITION BY b.vec_id
       |           ORDER BY ${duckL2Sq("b.embedding", "t.ce")}, t.cell) AS rn
       |       FROM v2 b CROSS JOIN ${p}tc t),
       |${p}ix AS (SELECT id, v, cell FROM ${p}ar WHERE rn = 1),
       |${p}pr AS (SELECT q.qid, q.qv, t.cell,
       |         row_number() OVER (PARTITION BY q.qid
       |           ORDER BY ${duckL2Sq("q.qv", "t.ce")}, t.cell) AS rn
       |       FROM q CROSS JOIN ${p}tc t),
       |${p}cand AS (SELECT pp.qid, ix.id AS nid, ${duckL2Sq("pp.qv", "ix.v")} AS d
       |       FROM ${p}pr pp JOIN ${p}ix ix ON ix.cell = pp.cell AND pp.rn <= 2
       |       WHERE ix.id <> pp.qid),
       |${p}top AS (SELECT qid, nid FROM (
       |         SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rk
       |         FROM ${p}cand) WHERE rk <= 5),
       |${p}h AS (SELECT count(*) AS hits FROM ${p}top t JOIN ex USING (qid, nid)),
       |${p}occ AS (SELECT max(cnt) AS max_n FROM (
       |         SELECT count(*) AS cnt FROM ${p}ix GROUP BY cell))""".stripMargin

  private def duckAssignCte: String =
    s"""c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
       |      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
       |r AS (SELECT e.vec_id, e.embedding AS v, c.cell,
       |             row_number() OVER (PARTITION BY e.vec_id
       |                                ORDER BY ${duckL2Sq("e.embedding", "c.ce")}, c.cell) AS rn
       |      FROM embeddings e CROSS JOIN c),
       |assign AS (SELECT vec_id, v, cell FROM r WHERE rn = 1)""".stripMargin

  val all: Seq[GQuery] = Seq(

    // Nearest-centroid assignment (the per-iteration E-step and the
    // cluster-membership primitive): broadcast map-side argmin, lowest-cell
    // tie-break. The oracle replays the full k-way distance comparison.
    GQuery(
      "q133_kmeans_assign",
      s"""WITH $duckAssignCte
         |SELECT vec_id, cell FROM assign""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // assignment against lloyd's deterministic INIT state (8 lowest ids
      // as cells 0..7) — the E-step in isolation, fixed centroids
      val init = emb.orderBy("vec_id").limit(8)
        .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("cell"), col("embedding").as("centroid"))
      Clustering.assign(emb, init, metric = "EUCLIDEAN")
        .select(col("id").as("vec_id"), col("cell"))
    },

    // Cluster-balanced subsample: the 10 lowest-id members per cell —
    // bounded-heap per-cell top-k (map-side combined), not a per-cell
    // window sort. Oracle = the window-sort definition.
    GQuery(
      "q134_cluster_sample",
      s"""WITH $duckAssignCte
         |SELECT cell, vec_id FROM (
         |  SELECT cell, vec_id,
         |         row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
         |  FROM assign)
         |WHERE rn <= 10""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val init = emb.orderBy("vec_id").limit(8)
        .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("cell"), col("embedding").as("centroid"))
      val assigned = Clustering.assign(emb, init, metric = "EUCLIDEAN")
      Clustering.clusterSample(assigned, perCell = 10)
        .select(col("cell"), col("id").as("vec_id"))
    },

    // One full Lloyd iteration (the M-step): per-cell per-dim centroid
    // means rounded to 6, plus cell sizes. Floats survive the round trip:
    // lloyd stores round-6 doubles as float32 (quantization < 5e-7 for
    // |v| < 8), so re-rounding the cast-back double recovers the exact
    // oracle value.
    GQuery(
      "q135_kmeans_centroids",
      s"""WITH $duckAssignCte,
         |m AS (SELECT cell, generate_subscripts(v, 1) - 1 AS idx,
         |             unnest(v)::DOUBLE AS x
         |      FROM assign)
         |SELECT cell, idx, round(avg(x), 6) AS c, count(*) AS n_points
         |FROM m GROUP BY cell, idx""".stripMargin) { (s, dir) =>
      // lloyd keeps an empty cell's previous centroid with n_points=0; the
      // oracle derives rows only from cells that received assignments, so
      // the projection drops empties (can occur when the 8 lowest-id init
      // embeddings contain duplicates and the tie rule empties a cell).
      Clustering.lloyd(Tables.embeddings(s, dir), k = 8, iters = 1)
        .filter(col("n_points") > 0)
        .select(col("cell"), posexplode(col("centroid")).as(Seq("idx", "x")),
          col("n_points"))
        .select(col("cell"), col("idx").cast("long").as("idx"),
          round(col("x").cast("double"), 6).as("c"), col("n_points"))
    },

    // D4 prototypicality pruning (SSL-prototypes): per cell, drop the 25%
    // of points CLOSEST to the centroid (cosine), keep the diverse
    // remainder. Assignment argmin replays unrounded; the prune rank orders
    // by the round-6 proto score shared by both engines. The operator's
    // window exchange carries (id, cell, proto) scalars only — machine-
    // asserted by PlanShapeSpec.
    GQuery(
      "q161_prototypicality_prune",
      s"""WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
         |           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |r AS (SELECT e.vec_id, c.cell, ${duckCosDist("e.embedding", "c.ce")} AS d,
         |             row_number() OVER (PARTITION BY e.vec_id
         |                                ORDER BY ${duckCosDist("e.embedding", "c.ce")}, c.cell) AS rn
         |      FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cell, round(d, 6) AS proto FROM r WHERE rn = 1),
         |rk AS (SELECT vec_id, cell, proto,
         |              row_number() OVER (PARTITION BY cell ORDER BY proto, vec_id) AS rnk,
         |              count(*) OVER (PARTITION BY cell) AS cnt
         |       FROM assign)
         |SELECT vec_id, cell, proto FROM rk WHERE rnk > ceil(cnt * 0.25)""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val init = emb.orderBy("vec_id").limit(8)
        .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("cell"), col("embedding").as("centroid"))
      Clustering.prototypicalityPrune(emb, init, dropFrac = 0.25,
        metric = "COSINE")
    },

    // IVF recall@5 vs nProbe with LLOYD-TRAINED centroids — the
    // index-quality eval card: one Lloyd iteration (init = 8 lowest ids,
    // round-6 means stored float32), re-assign the base to the trained
    // cells, probe 1/2/4/8 cells per query, and score each width's top-5
    // against exact KNN. The oracle replays the ENTIRE composition —
    // training M-step (round(avg,6)::FLOAT reproduces the engine's float32
    // centroids exactly, the q135 convention), trained-cell assignment,
    // probe selection, per-width ranking, and the recall rollup — so a
    // green row proves trained-quantizer IVF end-to-end, not just the
    // fixed-quantizer form q50 pins.
    GQuery(
      "q192_ivf_recall_curve",
      s"""WITH $duckAssignCte,
         |m AS (SELECT cell, generate_subscripts(v, 1) - 1 AS idx,
         |             unnest(v)::DOUBLE AS x
         |      FROM assign),
         |cm AS (SELECT cell, idx, round(avg(x), 6)::FLOAT AS cv
         |       FROM m GROUP BY cell, idx),
         |tc AS (SELECT cell, list(cv ORDER BY idx) AS ce FROM cm GROUP BY cell),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |ar AS (SELECT e.vec_id AS id, e.embedding AS v, tc.cell,
         |              row_number() OVER (PARTITION BY e.vec_id
         |                                 ORDER BY ${duckL2Sq("e.embedding", "tc.ce")}, tc.cell) AS rn
         |       FROM embeddings e CROSS JOIN tc),
         |a2 AS (SELECT id, v, cell FROM ar WHERE rn = 1),
         |pr AS (SELECT q.qid, q.qv, tc.cell,
         |              row_number() OVER (PARTITION BY q.qid
         |                                 ORDER BY ${duckL2Sq("q.qv", "tc.ce")}, tc.cell) AS rn
         |       FROM q CROSS JOIN tc),
         |ex AS (SELECT qid, nid FROM (
         |         SELECT q.qid, e.vec_id AS nid,
         |                row_number() OVER (PARTITION BY q.qid
         |                                   ORDER BY ${duckL2Sq("q.qv", "e.embedding")}, e.vec_id) AS rk
         |         FROM q JOIN embeddings e ON e.vec_id <> q.qid)
         |       WHERE rk <= 5),
         |np AS (SELECT unnest([1, 2, 4, 8]) AS n_probe),
         |cand AS (SELECT np.n_probe, p.qid, a2.id AS nid,
         |                ${duckL2Sq("p.qv", "a2.v")} AS d
         |         FROM np JOIN pr p ON p.rn <= np.n_probe
         |              JOIN a2 ON a2.cell = p.cell
         |         WHERE a2.id <> p.qid),
         |ivf AS (SELECT n_probe, qid, nid FROM (
         |          SELECT n_probe, qid, nid,
         |                 row_number() OVER (PARTITION BY n_probe, qid
         |                                    ORDER BY d, nid) AS rk
         |          FROM cand)
         |        WHERE rk <= 5),
         |h AS (SELECT n_probe, count(*) AS c
         |      FROM ivf JOIN ex USING (qid, nid) GROUP BY n_probe)
         |SELECT np.n_probe::BIGINT AS n_probe,
         |       round(coalesce(h.c, 0)::DOUBLE / 100, 6) AS recall
         |FROM np LEFT JOIN h USING (n_probe)""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val trained = Clustering.lloyd(emb, k = 8, iters = 1)
        .filter(col("n_points") > 0)
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      graft.operators.Ann.recallCurve(queries, emb,
        graft.operators.Ann.lloydCentroids(trained),
        k = 5, nProbes = Seq(1, 2, 4, 8), metric = "EUCLIDEAN",
        excludeSelf = true)
    },

    // k-center greedy coreset: seed at the lowest id, then twice pick the
    // point farthest from the selected set (max-min, the Gonzalez
    // 2-approximation) — the "spread the picks out" dual of
    // prototypicality pruning. Per round the corpus never moves: one pure
    // map against the single broadcast center + a bounded TakeOrdered(1).
    // Distances round to 6 before every argmax and ties break by id, so
    // the oracle unrolls the rounds and walks the identical pick chain,
    // emitting each pick's coverage radius.
    GQuery(
      "q204_kcenter_coreset",
      """WITH pts AS (SELECT vec_id AS id, embedding AS v
        |             FROM embeddings WHERE vec_id < 200),
        |s1 AS (SELECT id, v FROM pts ORDER BY id LIMIT 1),
        |d1 AS (SELECT p.id, p.v,
        |         round(sqrt(list_sum(list_transform(range(1, len(p.v)+1),
        |           i -> (p.v[i]::DOUBLE - s1.v[i]::DOUBLE)
        |              * (p.v[i]::DOUBLE - s1.v[i]::DOUBLE)))), 6) AS mind
        |       FROM pts p CROSS JOIN s1 WHERE p.id != s1.id),
        |p2 AS (SELECT id, v, mind FROM d1 ORDER BY mind DESC, id LIMIT 1),
        |d2 AS (SELECT d1.id, d1.v,
        |         least(d1.mind,
        |           round(sqrt(list_sum(list_transform(range(1, len(d1.v)+1),
        |             i -> (d1.v[i]::DOUBLE - p2.v[i]::DOUBLE)
        |                * (d1.v[i]::DOUBLE - p2.v[i]::DOUBLE)))), 6)) AS mind
        |       FROM d1 CROSS JOIN p2 WHERE d1.id != p2.id),
        |p3 AS (SELECT id, mind FROM d2 ORDER BY mind DESC, id LIMIT 1)
        |SELECT rank, id, d FROM (
        |  SELECT 1::BIGINT AS rank, id, 0.0 AS d FROM s1
        |  UNION ALL SELECT 2::BIGINT, id, mind FROM p2
        |  UNION ALL SELECT 3::BIGINT, id, mind FROM p3)""".stripMargin) { (s, dir) =>
      graft.operators.Coreset.kCenterGreedy(
        Tables.embeddings(s, dir).filter(col("vec_id") < 200),
        "vec_id", "embedding", k = 3, metric = "EUCLIDEAN")
        .select(col("rank").cast("long").as("rank"), col("id"), col("d"))
    },

    // Per-group k-center: the per-domain diversity sampler ("the 2 most
    // spread-out vectors of every label"). Same greedy and determinism
    // rules as q204, but each label's selection runs in-task over its
    // bounded member set (one group-keyed shuffle, no window, no driver
    // rounds). The oracle unrolls both picks per group with windowed
    // argmaxes partitioned by label.
    GQuery(
      "q211_kcenter_per_group",
      """WITH pts AS (SELECT label, vec_id AS id, embedding AS v
        |             FROM embeddings WHERE vec_id < 300),
        |s1 AS (SELECT label, id, v FROM (
        |         SELECT label, id, v,
        |                row_number() OVER (PARTITION BY label ORDER BY id) AS rn
        |         FROM pts) WHERE rn = 1),
        |d1 AS (SELECT p.label, p.id,
        |         round(sqrt(list_sum(list_transform(range(1, len(p.v)+1),
        |           i -> (p.v[i]::DOUBLE - s1.v[i]::DOUBLE)
        |              * (p.v[i]::DOUBLE - s1.v[i]::DOUBLE)))), 6) AS mind
        |       FROM pts p JOIN s1 ON s1.label = p.label AND p.id != s1.id),
        |p2 AS (SELECT label, id, mind FROM (
        |         SELECT label, id, mind,
        |                row_number() OVER (PARTITION BY label
        |                  ORDER BY mind DESC, id) AS rn
        |         FROM d1) WHERE rn = 1)
        |SELECT label::BIGINT AS label, rank, id, d FROM (
        |  SELECT label, 1::BIGINT AS rank, id, 0.0 AS d FROM s1
        |  UNION ALL SELECT label, 2::BIGINT, id, mind FROM p2)""".stripMargin) { (s, dir) =>
      graft.operators.Coreset.kCenterPerGroup(
        Tables.embeddings(s, dir).filter(col("vec_id") < 300),
        "label", "vec_id", "embedding", k = 2, metric = "EUCLIDEAN")
        .select(col("label"), col("rank").cast("long").as("rank"),
          col("id"), col("d"))
    },

    // Quantizer-staleness card: a drifted slice (vec_id >= 400, every
    // component scaled by -3 — exact in float32 on both engines since the
    // double intermediate of a small-constant product never rounds twice)
    // is appended to the corpus, and the card measures recall@5 at
    // nProbe=2 plus occupancy skew for STALE centroids (Lloyd on the
    // pre-drift corpus) vs RETRAINED (Lloyd on the full corpus) — the
    // when-to-retrain artifact index maintenance (q235) cannot provide by
    // itself. The oracle replays BOTH one-step Lloyd trainings (q192's
    // round-6-mean float32 convention), both assignments, probes, top-5,
    // the shared exact truth, and the max-cell occupancy share.
    GQuery(
      "q236_ivf_staleness_card",
      s"""WITH v1 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400),
         |sl AS (SELECT vec_id,
         |         list_transform(embedding, x -> (x::DOUBLE * -3.0)::FLOAT) AS embedding
         |       FROM embeddings WHERE vec_id >= 400),
         |v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM sl),
         |${lloydTrainCte("v1", "s")},
         |${lloydTrainCte("v2", "f")},
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM sl WHERE vec_id < 420),
         |exr AS (SELECT q.qid, b.vec_id AS nid,
         |          row_number() OVER (PARTITION BY q.qid
         |            ORDER BY ${duckL2Sq("q.qv", "b.embedding")}, b.vec_id) AS rk
         |        FROM q JOIN v2 b ON b.vec_id <> q.qid),
         |ex AS (SELECT qid, nid FROM exr WHERE rk <= 5),
         |${stalenessEvalCte("s")},
         |${stalenessEvalCte("f")},
         |den AS (SELECT count(*) * 5 AS n FROM q),
         |tot AS (SELECT count(*) AS n FROM v2)
         |SELECT 'stale' AS config, 2::BIGINT AS n_probe,
         |       round(sh.hits::DOUBLE / den.n, 6) AS recall,
         |       round(socc.max_n::DOUBLE / tot.n, 6) AS max_cell_frac
         |FROM sh, socc, den, tot
         |UNION ALL
         |SELECT 'retrained', 2::BIGINT,
         |       round(fh.hits::DOUBLE / den.n, 6),
         |       round(focc.max_n::DOUBLE / tot.n, 6)
         |FROM fh, focc, den, tot""".stripMargin) { (s, dir) =>
      import graft.operators.Ann
      val emb = Tables.embeddings(s, dir)
      val v1 = emb.select("vec_id", "embedding").filter(col("vec_id") < 400)
      val slice = emb.select("vec_id", "embedding").filter(col("vec_id") >= 400)
        .withColumn("embedding", transform(col("embedding"), x => x * lit(-3.0f)))
      val v2 = v1.unionByName(slice)
      val stale = Ann.lloydCentroids(
        Clustering.lloyd(v1, k = 8, iters = 1).filter(col("n_points") > 0))
      val fresh = Ann.lloydCentroids(
        Clustering.lloyd(v2, k = 8, iters = 1).filter(col("n_points") > 0))
      val queries = slice.filter(col("vec_id") < 420)
      Ann.ivfStalenessCard(queries, v2,
        Seq("stale" -> stale, "retrained" -> fresh),
        k = 5, nProbe = 2, metric = "EUCLIDEAN", excludeSelf = true)
    },
  )
}
