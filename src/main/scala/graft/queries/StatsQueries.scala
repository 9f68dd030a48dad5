package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Cleanup, Freq, Generators, ProfileStats}

/** Statistical profiling, hygiene and deterministic synthesis queries
  * (SURVEY.md A2/A4-A8, F11): per-dim moments, histograms, exact quantiles,
  * two-sample K-S, zero/dup cleanup, Lehmer-gaussian generation — each
  * mirrored in engine-neutral DuckDB SQL.
  */
object StatsQueries {

  private val explodeDimsSql =
    "SELECT generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding)::DOUBLE AS v, label FROM embeddings"

  val all: Seq[GQuery] = Seq(

    // A6: per-dimension moments via posexplode + groupBy(dim).
    GQuery(
      "q27_per_dim_stats",
      s"""SELECT dim, round(avg(v), 6) AS mean, round(stddev(v), 6) AS std,
         |       round(min(v), 6) AS vmin, round(max(v), 6) AS vmax, count(*) AS cnt
         |FROM ($explodeDimsSql)
         |GROUP BY dim""".stripMargin) { (s, dir) =>
      ProfileStats.perDimStats(Tables.embeddings(s, dir), "embedding")
        .select(
          col("dim"),
          round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"),
          round(col("min"), 6).as("vmin"), round(col("max"), 6).as("vmax"),
          col("cnt"))
    },

    // Embedding covariance matrix (the one-pass treeAggregate input to
    // PCA/whitening): all d*d population covariances, oracled against
    // covar_pop recomputed from the exploded dims. The eigensolve/
    // projection on top is PcaSpec territory (not SQL-expressible).
    GQuery(
      "q139_covariance",
      """WITH m AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |                  unnest(embedding)::DOUBLE AS x
        |           FROM embeddings)
        |SELECT a.dim AS i, b.dim AS j, round(covar_pop(a.x, b.x), 6) AS cov
        |FROM m a JOIN m b ON a.vec_id = b.vec_id
        |GROUP BY a.dim, b.dim""".stripMargin) { (s, dir) =>
      graft.operators.Pca.covariance(Tables.embeddings(s, dir), "embedding")
    },

    // Per-dimension z-score standardization (feature scaling ahead of
    // clustering/LSH): stats collect to the driver, transform is map-side.
    GQuery(
      "q140_standardize",
      """WITH m AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS idx,
        |                  unnest(embedding)::DOUBLE AS x
        |           FROM embeddings),
        |st AS (SELECT idx, avg(x) AS mu, stddev_samp(x) AS sd FROM m GROUP BY idx)
        |SELECT vec_id, idx, round((x - mu) / sd, 6) AS z
        |FROM m JOIN st USING (idx)""".stripMargin) { (s, dir) =>
      graft.operators.Pca.standardize(Tables.embeddings(s, dir), "vec_id", "embedding")
    },

    // ANSI percent_rank without the single-partition window (the Ranking
    // two-pass rank, q132's machinery): score normalization over the
    // events value column. Oracle = DuckDB's real percent_rank over the
    // identical total order.
    GQuery(
      "q147_percent_rank",
      """SELECT event_id,
        |       round(percent_rank() OVER (ORDER BY value, event_id), 6) AS pr
        |FROM events""".stripMargin) { (s, dir) =>
      graft.operators.Ranking.percentRank(
        Tables.events(s, dir).select("event_id", "value"),
        Seq("value", "event_id"))
        .select("event_id", "pr")
    },

    // CCNet bucketing's cut points as VALUES (deciles of the score column):
    // the materialized thresholds a progressive-ingest pipeline broadcasts
    // so bucket assignment becomes a stateless per-row projection
    // (Ranking.bucketize — streaming-composable, StreamCurationSpec). The
    // exact path is oracled here; the approx path is the same mergeable
    // sketch quantilesApprox wraps.
    GQuery(
      "q149_bucket_thresholds",
      """WITH qs AS (SELECT quantile_cont(value,
        |                     [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |            FROM events)
        |SELECT generate_subscripts(q, 1)::BIGINT AS bucket,
        |       round(unnest(q), 6) AS threshold
        |FROM qs""".stripMargin) { (s, dir) =>
      graft.operators.Ranking.bucketThresholds(
        Tables.events(s, dir).select("value"), "value", k = 10)
    },

    // A7: fixed-width histogram with clamped edge buckets.
    GQuery(
      "q28_histogram",
      """SELECT least(greatest(CAST(floor(value / 25.0) AS BIGINT), 0), 19) AS bucket,
        |       count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      ProfileStats.histogram(Tables.events(s, dir), col("value"), lo = 0.0, hi = 500.0, buckets = 20)
    },

    // A7: exact linear-interpolation quantiles (empirical model table).
    GQuery(
      "q29_quantiles",
      """SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p,
        |       round(unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.9])), 4) AS q
        |FROM lineitem""".stripMargin) { (s, dir) =>
      // the distributed-sort exact form: scale-safe AND oracle-exact
      ProfileStats.quantilesExactDistributed(Tables.lineitem(s, dir),
          col("l_extendedprice"), Seq(0.25, 0.5, 0.75, 0.9))
        .select(col("p"), round(col("q"), 4).as("q"))
    },

    // HLL++ approximate distinct (the scale-path cardinality primitive:
    // constant sketch memory vs a distinct shuffle) proven within its
    // relative-error bound against the exact count — q71's pattern: the
    // output carries the EXACT per-source count (oracle-recomputable) plus
    // the bound check on the sketch.
    GQuery(
      "q141_distinct_approx",
      """SELECT source, count(DISTINCT doc_id) AS n_distinct,
        |       true AS approx_in_bounds
        |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
      val rsd = 0.02
      val byjoin = Tables.documents(s, dir)
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_distinct"),
          approx_count_distinct(col("doc_id"), rsd).as("approx"))
      byjoin.select(col("source"), col("n_distinct"),
        // 5 sigma on the sketch's standard relative error
        (abs(col("approx") - col("n_distinct")).cast("double") /
          col("n_distinct") <= rsd * 5).as("approx_in_bounds"))
    },

    // A7 production path: GK-sketch approximate quantiles, proven within the
    // rank-error bound against the exact form — the output carries the EXACT
    // quantile (oracle-recomputable) plus the bound check on the sketch.
    GQuery(
      "q71_quantiles_approx",
      """SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p,
        |       round(unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.9])), 4) AS q,
        |       true AS approx_in_bounds
        |FROM lineitem""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ps = Seq(0.25, 0.5, 0.75, 0.9)
      val acc = 10000
      val eps = 2.0 / acc // bracket at twice the sketch's rank-error bound
      val lo = ps.map(p => math.max(0.0, p - eps))
      val hi = ps.map(p => math.min(1.0, p + eps))
      val li = Tables.lineitem(s, dir)
      val v = col("l_extendedprice").cast("double")
      // exact side via the DISTRIBUTED sort path (no all-values buffer —
      // measured 2.1s vs 3.1s for the 12-quantile agg buffer at sf0.1);
      // the GK sketch under test is its own cheap aggregation
      val exact = ProfileStats.quantilesExactDistributed(li, v, ps ++ lo ++ hi)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val approx = li.agg(percentile_approx(v, typedLit(ps), lit(acc)))
        .collect()(0).getSeq[Double](0)
      ps.zipWithIndex.map { case (p, i) =>
        // HALF_UP to match Spark round()/DuckDB round() tie semantics
        (p, BigDecimal(exact(p)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          approx(i) >= exact(lo(i)) && approx(i) <= exact(hi(i)))
      }.toDF("p", "q", "approx_in_bounds")
    },

    // A7 production shape at scale: PER-DIMENSION sketch quantiles (one GK
    // sketch per dim, merged map-side — the dataset-profile path), bound-
    // checked per dim against the exact form.
    GQuery(
      "q88_quantiles_by_dim",
      s"""SELECT dim, unnest([0.25, 0.5, 0.75]) AS p,
         |       round(unnest(quantile_cont(v, [0.25, 0.5, 0.75])), 4) AS q,
         |       true AS in_bounds
         |FROM ($explodeDimsSql)
         |GROUP BY dim""".stripMargin) { (s, dir) =>
      val ps = Seq(0.25, 0.5, 0.75)
      val acc = 10000
      // bracket = sketch rank error (2/acc) + discrete-sample quantization
      // (the sketch returns an actual sample; with n values per dim the
      // interpolated exact at p±ε only brackets it once ε covers ~2 ranks)
      val nRows = Tables.embeddings(s, dir).count().toDouble
      val eps = 2.0 / acc + 2.0 / nRows
      val lo = ps.map(p => math.max(0.0, p - eps))
      val hi = ps.map(p => math.min(1.0, p + eps))
      val n = ps.size
      graft.operators.ProfileStats.explodeDims(Tables.embeddings(s, dir), "embedding")
        .groupBy("dim")
        .agg(
          percentile(col("value").cast("double"), typedLit(ps ++ lo ++ hi)).as("ex"),
          percentile_approx(col("value").cast("double"), typedLit(ps), lit(acc)).as("approx"))
        .select(col("dim"), posexplode(typedLit(List.range(0, n))).as(Seq("junk", "i")),
          col("ex"), col("approx"))
        .select(
          col("dim"),
          element_at(typedLit(ps), col("i") + 1).as("p"),
          round(element_at(col("ex"), col("i") + 1), 4).as("q"),
          (element_at(col("approx"), col("i") + 1) >=
            element_at(col("ex"), col("i") + lit(n + 1)) &&
            element_at(col("approx"), col("i") + 1) <=
              element_at(col("ex"), col("i") + lit(2 * n + 1)))
            .as("in_bounds"))
    },

    // A8: per-dimension two-sample K-S between label<5 and label>=5 vectors.
    GQuery(
      "q30_ks_by_label",
      s"""WITH s AS (SELECT dim, v, CASE WHEN label < 5 THEN 1 ELSE 2 END AS tag
         |           FROM ($explodeDimsSql) WHERE dim < 8),
         |r AS (SELECT dim,
         |        sum(CASE WHEN tag=1 THEN 1 ELSE 0 END) OVER (PARTITION BY dim ORDER BY v) AS c1,
         |        sum(CASE WHEN tag=2 THEN 1 ELSE 0 END) OVER (PARTITION BY dim ORDER BY v) AS c2,
         |        sum(CASE WHEN tag=1 THEN 1 ELSE 0 END) OVER (PARTITION BY dim) AS t1,
         |        sum(CASE WHEN tag=2 THEN 1 ELSE 0 END) OVER (PARTITION BY dim) AS t2
         |      FROM s)
         |SELECT dim, round(max(abs(c1::DOUBLE / t1 - c2::DOUBLE / t2)), 6) AS d
         |FROM r GROUP BY dim""".stripMargin) { (s, dir) =>
      val samples = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "value")))
        .filter(col("dim") < 8)
        .select(col("dim"), col("value").cast("double").as("value"),
          when(col("label") < 5, 1).otherwise(2).as("tag"))
      ProfileStats.ksStatistic(samples)
        .select(col("dim"), round(col("d"), 6).as("d"))
    },

    // A2: exact-zero and near-zero vector counting (forall quantifier).
    GQuery(
      "q31_count_zeros",
      """SELECT
        |  count(*) FILTER (len(list_filter(embedding, x -> x != 0)) = 0) AS n_zero,
        |  count(*) FILTER (list_max(list_transform(embedding, x -> abs(x::DOUBLE))) < 0.02) AS n_near_zero
        |FROM embeddings""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir).agg(
        sum(when(Cleanup.isZeroVector(col("embedding")), 1L).otherwise(0L)).as("n_zero"),
        sum(when(array_max(transform(col("embedding"), x => abs(x.cast("double")))) < 0.02, 1L)
          .otherwise(0L)).as("n_near_zero"))
    },

    // A4/A5/U4: cleanfvec on a union with injected duplicates — drop zero
    // vectors, keep the lowest-id representative of each duplicate group.
    GQuery(
      "q32_dedup_cleanup",
      """WITH u AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 50),
        |nz AS (SELECT * FROM u WHERE len(list_filter(embedding, x -> x != 0)) > 0)
        |SELECT min(vec_id) AS vec_id FROM nz GROUP BY embedding""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val withDups = emb.unionByName(
        emb.filter(col("vec_id") < 50)
          .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
      Cleanup.clean(withDups, "vec_id", "embedding").select("vec_id")
    },

    // F11: deterministic synthesis — engine-neutral Lehmer + Box-Muller, a
    // pure function of the ordinal (dataset_yaml_v1.md:143-145).
    GQuery(
      "q33_generate_gaussian",
      s"""SELECT i AS id, round(${Generators.lehmerGaussianSql("i")}, 6) AS z
         |FROM range(1000) t(i)""".stripMargin) { (s, _) =>
      s.range(1000).select(col("id"), round(Generators.lehmerGaussian(col("id")), 6).as("z"))
    },

    // Johnson–Lindenstrauss random projection 64→16 dims: the oracle
    // rebuilds the ±1/√k sign matrix from the same md5-60 parity and
    // replays the matmul — determinism IS the contract (no RNG state).
    GQuery(
      "q158_random_project",
      """WITH m AS (SELECT i, j,
        |             CASE WHEN ('0x' || substr(md5('rp:' || i || ':' || j), 1, 15))::BIGINT % 2 = 0
        |                  THEN 1.0 ELSE -1.0 END / sqrt(16) AS w
        |           FROM range(16) r1(i) CROSS JOIN range(64) r2(j)),
        |e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
        |             unnest(embedding)::DOUBLE AS v
        |      FROM embeddings)
        |SELECT e.vec_id, m.i AS idx, round(sum(e.v * m.w), 6) AS proj
        |FROM e JOIN m ON m.j = e.j
        |GROUP BY e.vec_id, m.i""".stripMargin) { (s, dir) =>
      graft.operators.Pca.randomProject(
        Tables.embeddings(s, dir).select("vec_id", "embedding"),
        "vec_id", "embedding", k = 16)
    },

    // Count-Min heavy hitters: the corpus token stream folds into a 3×64
    // counter grid (one treeAggregate, no shuffle), and every distinct
    // token with min-over-rows bucket sum ≥ 100 surfaces. The grid is
    // deliberately narrow so COLLISIONS inflate the estimates at this
    // scale — the oracle replays every counter from the md5-60 contract,
    // so a green row proves the engine reproduces the sketch bit-exactly,
    // collision inflation included (and cms_count ≥ the true count by the
    // CMS guarantee — no heavy hitter is missed).
    GQuery(
      "q166_cms_heavy_hitters",
      """WITH toks AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x != '')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |js AS (SELECT unnest([0, 1, 2]) AS j),
        |ps AS (SELECT term, c, j,
        |         ('0x' || substr(md5(term || ':' || j::VARCHAR), 1, 15))::BIGINT % 64 AS pos
        |       FROM tc CROSS JOIN js),
        |bkt AS (SELECT j, pos, sum(c) AS bc FROM ps GROUP BY j, pos),
        |est AS (SELECT term, min(bc)::BIGINT AS cms_count
        |        FROM ps JOIN bkt USING (j, pos) GROUP BY term)
        |SELECT term, cms_count FROM est WHERE cms_count >= 100""".stripMargin) { (s, dir) =>
      graft.operators.Cms.heavyHitters(Tables.documents(s, dir), "text",
        depth = 3, width = 64, threshold = 100L)
    },

    // CMS commonness scoring: the per-document fraction of token
    // occurrences that are corpus-wide heavy hitters (CMS estimate ≥ 800)
    // — the boilerplate signal, and the STREAMING face of the sketch: the
    // probe is a pure map against the broadcast grid (StreamCurationSpec
    // pins stream == batch), so progressive ingest scores docs against a
    // frozen corpus sketch with zero shuffle. The oracle replays the
    // counters and the per-doc fraction.
    GQuery(
      "q177_cms_common_fraction",
      """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x != '')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |js AS (SELECT unnest([0, 1, 2]) AS j),
        |ps AS (SELECT term, c, j,
        |         ('0x' || substr(md5(term || ':' || j::VARCHAR), 1, 15))::BIGINT % 4096 AS pos
        |       FROM tc CROSS JOIN js),
        |bkt AS (SELECT j, pos, sum(c) AS bc FROM ps GROUP BY j, pos),
        |est AS (SELECT term, min(bc)::BIGINT AS e
        |        FROM ps JOIN bkt USING (j, pos) GROUP BY term),
        |d AS (SELECT t.doc_id, count(*) AS total,
        |             count(*) FILTER (WHERE e >= 800) AS common
        |      FROM toks t JOIN est USING (term) GROUP BY t.doc_id)
        |SELECT doc.doc_id,
        |       round(coalesce(common::DOUBLE / total, 0.0), 6) AS common_frac
        |FROM documents doc LEFT JOIN d USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val toks = docs.select(explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val grid = graft.operators.Cms.build(toks, "term", depth = 3, width = 4096)
      graft.operators.Cms.commonTokenFraction(docs, grid, depth = 3,
        "doc_id", "text", threshold = 800L)
    },

    // Per-group MAD winsorization: each event_type clips to its OWN
    // median ± 3·MAD fence — the per-domain form of q172, built on the
    // window-free grouped quantiles (two range passes, broadcast fences,
    // pure-projection clip). The oracle replays both grouped medians
    // (6-rounded, groupedQuantiles' contract) and the fence arithmetic.
    GQuery(
      "q181_grouped_winsorize",
      """WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS m
        |             FROM events GROUP BY event_type),
        |mad AS (SELECT e.event_type,
        |               round(quantile_cont(abs(e.value - m.m), 0.5), 6) AS d
        |        FROM events e JOIN med m USING (event_type)
        |        GROUP BY e.event_type),
        |f AS (SELECT med.event_type, m, d FROM med JOIN mad USING (event_type))
        |SELECT e.event_id, e.event_type,
        |       round(least(greatest(e.value, f.m - 3 * f.d), f.m + 3 * f.d), 6)
        |         AS winsorized
        |FROM events e JOIN f USING (event_type)""".stripMargin) { (s, dir) =>
      ProfileStats.groupedMadWinsorize(
        Tables.events(s, dir).select("event_id", "event_type", "value"),
        "event_type", "value")
        .select("event_id", "event_type", "winsorized")
    },

    // MAD winsorization: outlier-robust clipping of the event value column
    // to median ± 3·MAD — the fence a quality-score pipeline applies
    // before thresholds/mixtures so outliers can't set their own cut
    // (mean ± k·stddev would move WITH the outliers). Exact medians via
    // the distributed-sort quantile path (q29's machinery, one double
    // collected per pass); the clip itself is a pure projection. The
    // oracle replays both medians and the fence arithmetic.
    GQuery(
      "q172_mad_winsorize",
      """WITH med AS (SELECT median(value) AS m FROM events),
        |mad AS (SELECT median(abs(value - m)) AS d FROM events CROSS JOIN med)
        |SELECT event_id,
        |       round(least(greatest(value, m - 3 * d), m + 3 * d), 6) AS winsorized
        |FROM events CROSS JOIN med CROSS JOIN mad""".stripMargin) { (s, dir) =>
      ProfileStats.madWinsorize(
        Tables.events(s, dir).select("event_id", "value"), "value")
        .select("event_id", "winsorized")
    },

    // Misra-Gries guaranteed heavy hitters: the DETERMINISTIC leg of the
    // frequency family. Phase 1 folds the term stream (word-initial code
    // points here — the discriminative domain on this corpus) into ≤ 15
    // counters in one treeAggregate; phase 2 exact-counts ONLY the ≤ 15
    // broadcast candidates and filters to the n/(k+1) guarantee. The
    // full-vocabulary shuffle never runs, yet the output — every term
    // with true count > n/16, with its EXACT count — is deterministic
    // under any partitioning (the MG guarantee; FreqSpec pins merge-order
    // invariance). The oracle computes the same set directly.
    GQuery(
      "q199_mg_heavy",
      """WITH toks AS (SELECT substr(unnest(list_filter(
        |                string_split(lower(text), ' '), x -> x != '')), 1, 1)
        |                AS term FROM documents),
        |n AS (SELECT count(*) AS c FROM toks),
        |tc AS (SELECT term, count(*) AS tf FROM toks GROUP BY term)
        |SELECT term, tf FROM tc CROSS JOIN n
        |WHERE tf > c / 16.0""".stripMargin) { (s, dir) =>
      val terms = Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(substring(col("w"), 1, 1).as("term"))
      Freq.guaranteedHeavy(terms, "term", k = 15)
    },
  )
}
