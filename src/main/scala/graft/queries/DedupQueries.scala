package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Bloom, Clustering, Dedup, Sampling}

/** Deduplication + similarity-search queries over documents/embeddings —
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding cosine, IVF ANN.
  * Oracles compute the same semantics from first principles (brute force
  * where the Spark side uses candidate generation — the oracle IS the
  * recall check).
  */
object DedupQueries {

  private val duckToks = "list_filter(string_split(lower(text), ' '), x -> x != '')"

  /** Distinct 3-gram shingle postings + Jaccard pair SQL (shared CTE text). */
  private[queries] def jaccardPairsSql(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
       |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
       |          i -> array_to_string(t[i:i+2], ' '))) AS sh
       |        FROM toks WHERE len(t) >= 3),
       |sh AS (SELECT doc_id, unnest(sh) AS shingle FROM sh0),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT ia AS id_a, ib AS id_b,
       |       round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
       |FROM inter
       |JOIN sz sa ON sa.doc_id = ia
       |JOIN sz sb ON sb.doc_id = ib
       |WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= $threshold""".stripMargin

  /** DuckDB cosine similarity between two float-list refs, f64. */
  private def duckCosine(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       | / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE*x::DOUBLE)))
       |  * sqrt(list_sum(list_transform($b, x -> x::DOUBLE*x::DOUBLE)))))""".stripMargin

  private def duckCosDist(a: String, b: String): String = s"(1.0 - ${duckCosine(a, b)})"

  /** DuckDB squared-L2 between two float-list refs (argmin-invariant). */
  private def duckL2Sq(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |  i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE)))""".stripMargin

  /** 60-bit md5 simhash CTE over documents: yields (doc_id, simhash). */
  private val simhashSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
       |th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       |bits AS (SELECT doc_id, b,
       |           CASE WHEN sum(((h >> CAST(b AS INTEGER)) & 1) * 2 - 1) > 0
       |                THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |         FROM th CROSS JOIN range(60) r(b) GROUP BY doc_id, b)
       |SELECT doc_id, sum(bit << CAST(b AS INTEGER))::BIGINT AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin

  val all: Seq[GQuery] = Seq(

    // Exact dedup by content fingerprint over a corpus with injected copies.
    GQuery(
      "q44_exact_dedup_groups",
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 30)
        |SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |       min(doc_id) AS canonical_id, count(*) AS multiplicity
        |FROM u GROUP BY 1 HAVING count(*) > 1""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val u = docs.unionByName(
        docs.filter(col("doc_id") < 30).select((col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.exactGroups(u, "doc_id", "text").filter(col("multiplicity") > 1)
    },

    // Exact n-gram Jaccard pairs via inverted-index join (no n² pair space).
    GQuery(
      "q45_ngram_jaccard_pairs",
      jaccardPairsSql(0.5)) { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    },

    // MinHash+LSH with exact verification: must equal the brute-force pair
    // set at the 0.8 threshold (the oracle IS the recall proof — band miss
    // probability ~5e-8 at s=0.8 with 32×4 bands).
    GQuery(
      "q46_minhash_lsh_pairs",
      jaccardPairsSql(0.8)) { (s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, numPerms = 128, bands = 32, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    },

    // SimHash values, bit-exact against the engine-neutral md5 construction.
    GQuery("q47_simhash", simhashSql) { (s, dir) =>
      Dedup.simhash(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },

    // SimHash near-dup pairs (Hamming <= 3) via pigeonhole chunk banding;
    // oracle brute-forces the pair space.
    GQuery(
      "q48_simhash_neardup",
      s"""WITH s AS ($simhashSql)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin) { (s, dir) =>
      val sims = Dedup.simhash(Tables.documents(s, dir), "doc_id", "text")
      Dedup.simhashNearDupPairs(sims, maxHamming = 3, chunks = 4, bits = 60)
        .withColumnsRenamed(Map("id_a" -> "id_a", "id_b" -> "id_b"))
    },

    // Embedding-cosine near-duplicate pairs.
    GQuery(
      "q49_embedding_neardup",
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(${duckCosine("a.embedding", "b.embedding")}, 6) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.4""".stripMargin) { (s, dir) =>
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    },

    // Dedup clusters: connected components over the >=0.8-Jaccard pair
    // graph (iterative min-label propagation; oracle = recursive-CTE
    // transitive closure).
    GQuery(
      "q59_dedup_clusters",
      s"""WITH RECURSIVE p AS (${jaccardPairsSql(0.8)}),
         |edges AS (
         |  SELECT id_a AS s, id_b AS t FROM p
         |  UNION ALL
         |  SELECT id_b AS s, id_a AS t FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id)
         |SELECT id AS doc_id, min(r) AS cluster_id
         |FROM reach GROUP BY id""".stripMargin) { (s, dir) =>
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8)
      Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
    },

    // Embedding near-dup, BUCKETED production path: hyperplane-LSH candidate
    // buckets → exact cosine verify, against the all-pairs oracle over a
    // corpus with planted perturbed copies (cos ≈ 0.999) — the green row is
    // the recall proof for the scale path, mirroring what q46 does for
    // MinHash.
    GQuery(
      "q70_embedding_neardup_bucketed",
      s"""WITH u AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000,
         |         list_transform(embedding, x -> (x::DOUBLE * 0.9 + 0.01)::FLOAT)
         |  FROM embeddings WHERE vec_id < 40)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(${duckCosine("a.embedding", "b.embedding")}, 6) AS cosine
         |FROM u a JOIN u b ON a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.95""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val perturbed = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * 0.9 + 0.01).cast("float")).as("embedding"))
      Dedup.embeddingNearDupPairsBucketed(emb.unionByName(perturbed),
          "vec_id", "embedding", threshold = 0.95)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    },

    // n-gram Jaccard with the hot-shingle document-frequency cap ON — must
    // produce the identical pair set as the uncapped exact form (the cap
    // only prunes candidate generation; verification reads full sets).
    GQuery(
      "q82_ngram_jaccard_capped",
      jaccardPairsSql(0.5)) { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5, dfCap = 64)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    },

    // Benchmark decontamination: per-doc 3-gram containment against an
    // eval set (docs < 20 stand in for the benchmark) — the broadcast-side
    // semi-join shape a 100TB decontamination pass uses.
    GQuery(
      "q87_decontamination",
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
         |          i -> array_to_string(t[i:i+2], ' '))) AS sh
         |        FROM toks WHERE len(t) >= 3),
         |doc AS (SELECT doc_id, unnest(sh) AS shingle FROM sh0 WHERE doc_id >= 20),
         |bset AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh0 WHERE doc_id < 20),
         |sz AS (SELECT doc_id, count(*) AS sz FROM doc GROUP BY 1),
         |hits AS (SELECT d.doc_id, count(*) AS h FROM doc d
         |         JOIN bset b ON d.shingle = b.shingle GROUP BY 1)
         |SELECT a.doc_id,
         |       round(CASE WHEN coalesce(sz, 0) = 0 THEN 0.0
         |             ELSE coalesce(h, 0)::DOUBLE / sz END, 6) AS containment
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) a
         |LEFT JOIN sz ON sz.doc_id = a.doc_id
         |LEFT JOIN hits ON hits.doc_id = a.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.containmentScores(
          docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
          "doc_id", "text", n = 3)
        .select(col("id").as("doc_id"), round(col("containment"), 6).as("containment"))
    },

    // The composed dedup cascade (exact -> near-dup over exact survivors):
    // one row per doc with kept/exact_dup/near_dup status and canonical id.
    // The oracle replays both stages: md5-fingerprint groups, then string
    // 3-gram Jaccard pairs among survivors with the one-hop greedy drop.
    GQuery(
      "q97_dedup_pipeline",
      s"""WITH fp AS (SELECT doc_id,
         |              md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
         |            FROM documents),
         |canon AS (SELECT f, min(doc_id) AS ec FROM fp GROUP BY f),
         |wc AS (SELECT fp.doc_id, canon.ec FROM fp JOIN canon ON fp.f = canon.f),
         |surv AS (SELECT d.doc_id, d.text FROM documents d
         |         JOIN wc ON wc.doc_id = d.doc_id AND wc.doc_id = wc.ec),
         |toks AS (SELECT doc_id, $duckToks AS t FROM surv),
         |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
         |          i -> array_to_string(t[i:i+2], ' '))) AS sh
         |        FROM toks WHERE len(t) >= 3),
         |sh AS (SELECT doc_id, unnest(sh) AS shingle FROM sh0),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
         |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |pairs AS (SELECT ia, ib FROM inter
         |          JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |          WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.5),
         |near AS (SELECT ib AS doc_id, min(ia) AS nc FROM pairs GROUP BY ib)
         |SELECT wc.doc_id,
         |       CASE WHEN wc.doc_id != wc.ec THEN 'exact_dup'
         |            WHEN near.nc IS NOT NULL THEN 'near_dup'
         |            ELSE 'kept' END AS status,
         |       CASE WHEN wc.doc_id != wc.ec THEN wc.ec
         |            WHEN near.nc IS NOT NULL THEN near.nc
         |            ELSE wc.doc_id END AS canonical_id
         |FROM wc LEFT JOIN near ON near.doc_id = wc.doc_id""".stripMargin) { (s, dir) =>
      Dedup.dedupPipeline(Tables.documents(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5)
        .select(col("id").as("doc_id"), col("status"), col("canonical_id"))
    },

    // IVF-Flat ANN: deterministic coarse quantizer (cells = vec_id<16),
    // nProbe=4, exact top-5 within probed cells. Oracle replays the exact
    // algorithm — this checks index assignment, probe selection and ranking.
    GQuery(
      "q50_ann_ivf",
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
      val index = Ann.ivfIndex(emb, centroids)
      Ann.ivfSearch(queries, index, centroids, k = 5, nProbe = 4, excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    },

    // Duplicated-span detection (exact-substring dedup signal): every 25th
    // document is planted twice, so its every 8-gram position is duplicated
    // (dup_fraction 1.0) and the originals light up too. The oracle
    // recomputes tokenization, positional 8-grams, the md5-60-bit gram hash,
    // global counts and the per-doc fractions from first principles.
    GQuery(
      "q118_duplicated_spans",
      """WITH d AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 10000, text FROM documents WHERE doc_id % 25 = 0),
        |t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |      FROM d),
        |g AS (SELECT doc_id,
        |             ('0x' || substr(md5(array_to_string(toks[(i+1):(i+8)], ' ')), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks, unnest(range(len(toks) - 8 + 1)) AS i
        |            FROM t WHERE len(toks) >= 8)),
        |counts AS (SELECT h, count(*) AS c FROM g GROUP BY h),
        |tot AS (SELECT doc_id, count(*) AS n_positions FROM g GROUP BY doc_id),
        |dup AS (SELECT g.doc_id, count(*) AS n_dup
        |        FROM g JOIN counts USING (h) WHERE c > 1 GROUP BY g.doc_id)
        |SELECT d.doc_id, coalesce(n_positions, 0) AS n_positions,
        |       coalesce(n_dup, 0) AS n_dup,
        |       round(CASE WHEN coalesce(n_positions, 0) = 0 THEN 0.0
        |                  ELSE coalesce(n_dup, 0)::DOUBLE / n_positions END, 6) AS dup_fraction
        |FROM d LEFT JOIN tot USING (doc_id) LEFT JOIN dup USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      Dedup.duplicatedSpans(docs.unionByName(planted), "doc_id", "text", w = 8)
        .select(col("id").as("doc_id"), col("n_positions"), col("n_dup"),
          round(col("dup_fraction"), 6).as("dup_fraction"))
    },

    // Semantic dedup (SemDeDup composition): bucketed-LSH near-dup pairs →
    // connected components → keep-min survivors, over a corpus with planted
    // perturbed copies (cos ≈ 0.999). The oracle recomputes the whole thing
    // from all-pairs cosine + a recursive-CTE component closure — green only
    // if LSH recall, component formation AND the keep rule all hold.
    GQuery(
      "q119_semantic_dedup",
      s"""WITH RECURSIVE u AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000,
         |         list_transform(embedding, x -> (x::DOUBLE * 0.9 + 0.01)::FLOAT)
         |  FROM embeddings WHERE vec_id < 40),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |      FROM u a JOIN u b ON a.vec_id < b.vec_id
         |      WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.95),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id),
         |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
         |SELECT u.vec_id AS id, coalesce(lab.cluster, u.vec_id) AS cluster_id,
         |       (coalesce(lab.cluster, u.vec_id) = u.vec_id) AS keep
         |FROM u LEFT JOIN lab ON lab.id = u.vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val perturbed = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * 0.9 + 0.01).cast("float")).as("embedding"))
      Dedup.semanticDedup(emb.unionByName(perturbed), "vec_id", "embedding",
        threshold = 0.95)
    },

    // Semantic decontamination: per-doc max cosine against a "benchmark"
    // embedding set (the first 10 vectors), over a corpus with planted
    // perturbed bench copies that must light up near 1.0. The oracle
    // recomputes every pairwise cosine and the max from first principles.
    GQuery(
      "q124_semantic_decontamination",
      s"""WITH bench AS (SELECT embedding FROM embeddings WHERE vec_id < 10),
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10
         |  UNION ALL
         |  SELECT vec_id + 20000,
         |         list_transform(embedding, x -> (x::DOUBLE * 0.95 + 0.02)::FLOAT)
         |  FROM embeddings WHERE vec_id < 10)
         |SELECT c.vec_id AS id, round(max(${duckCosine("c.embedding", "b.embedding")}), 6) AS max_cosine
         |FROM corpus c CROSS JOIN bench b
         |GROUP BY c.vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val bench = emb.filter(col("vec_id") < 10)
      val planted = bench.select((col("vec_id") + 20000).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * 0.95 + 0.02).cast("float")).as("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select("vec_id", "embedding").unionByName(planted)
      Dedup.semanticContamination(corpus, bench, "vec_id", "embedding")
    },

    // k-means-sharded semantic dedup — SemDeDup's actual paper shape:
    // assign every embedding to its nearest centroid (8 lowest-id inits,
    // q133's deterministic E-step), near-dup pairs WITHIN cells only, then
    // the q119 components + keep-min. The cells bound the candidate space
    // structurally (no LSH recall knob to mis-size); the oracle replays
    // assignment, within-cell cosine pairs and the recursive closure from
    // first principles, so a green hash proves the sharded SEMANTICS —
    // including which near-dup pairs a cell boundary hides.
    GQuery(
      "q150_semantic_dedup_sharded",
      s"""WITH RECURSIVE u AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000,
         |         list_transform(embedding, x -> (x::DOUBLE * 0.9 + 0.01)::FLOAT)
         |  FROM embeddings WHERE vec_id < 40),
         |cen AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |               embedding AS ce
         |        FROM (SELECT * FROM u ORDER BY vec_id LIMIT 8)),
         |r AS (SELECT e.vec_id, e.embedding AS v, cen.cell,
         |             row_number() OVER (PARTITION BY e.vec_id
         |                                ORDER BY ${duckL2Sq("e.embedding", "cen.ce")}, cen.cell) AS rn
         |      FROM u e CROSS JOIN cen),
         |asg AS (SELECT vec_id, v, cell FROM r WHERE rn = 1),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      WHERE ${duckCosine("a.v", "b.v")} >= 0.95),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id),
         |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
         |SELECT u.vec_id AS id, coalesce(lab.cluster, u.vec_id) AS cluster_id,
         |       (coalesce(lab.cluster, u.vec_id) = u.vec_id) AS keep
         |FROM u LEFT JOIN lab ON lab.id = u.vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val perturbed = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * 0.9 + 0.01).cast("float")).as("embedding"))
      val corpus = emb.unionByName(perturbed)
      val init = corpus.orderBy("vec_id").limit(8)
        .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("cell"), col("embedding").as("centroid"))
      Dedup.semanticDedupSharded(corpus, "vec_id", "embedding",
        threshold = 0.95, centroids = init)
    },

    // Paragraph-level exact dedup (CCNet's first pass): every 7th document
    // gains boilerplate header/footer paragraphs, so the operator must keep
    // each boilerplate line only in the lowest (doc_id, pos) occurrence and
    // reassemble the rest in order; the corpus's planted exact-duplicate
    // docs lose their whole body the same way. The oracle replays the
    // normalized-fingerprint winner rule with a window over (doc_id, pos).
    GQuery(
      "q156_line_dedup",
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN doc_id % 7 = 0
        |                  THEN 'Subscribe to our newsletter' || chr(10) || text
        |                       || chr(10) || 'All rights reserved'
        |                  ELSE text END AS t
        |           FROM documents),
        |p AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS para,
        |             unnest(range(len(string_split(t, chr(10))))) AS pos
        |      FROM d),
        |k AS (SELECT doc_id, pos, para,
        |             row_number() OVER (
        |               PARTITION BY md5(trim(regexp_replace(lower(para), '\s+', ' ', 'g')))
        |               ORDER BY doc_id, pos) AS rn
        |      FROM p)
        |SELECT doc_id,
        |       coalesce(string_agg(para, chr(10) ORDER BY pos) FILTER (WHERE rn = 1), '') AS text,
        |       count(*) FILTER (WHERE rn = 1) AS n_kept,
        |       count(*) FILTER (WHERE rn > 1) AS n_dropped
        |FROM k GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("Subscribe to our newsletter\n"), col("text"),
            lit("\nAll rights reserved")))
          .otherwise(col("text")).as("text"))
      Dedup.lineDedup(docs, "doc_id", "text", "\n")
    },

    // Bloom-filter decontamination: the benchmark (docs < 20) folds into a
    // 2^16-bit / 3-probe filter, and each corpus doc scores the fraction of
    // its distinct 3-gram shingles whose every probe bit is set. The filter
    // is deliberately small so FALSE POSITIVES occur at this scale — the
    // oracle replays every probe position from the md5-60 contract, so a
    // green row proves the engine reproduces the bloom decision bit-exactly,
    // collisions included (and bloom_containment >= the exact q87 score by
    // construction).
    GQuery(
      "q162_bloom_decontamination",
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
         |          i -> array_to_string(t[i:i+2], ' '))) AS sh
         |        FROM toks WHERE len(t) >= 3),
         |doc AS (SELECT doc_id, unnest(sh) AS shingle FROM sh0 WHERE doc_id >= 20),
         |bsh AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh0 WHERE doc_id < 20),
         |js AS (SELECT unnest([0, 1, 2]) AS j),
         |bpos AS (SELECT DISTINCT
         |           ('0x' || substr(md5(shingle || ':' || j::VARCHAR), 1, 15))::BIGINT % 65536 AS pos
         |         FROM bsh CROSS JOIN js),
         |dp AS (SELECT doc_id, shingle,
         |         ('0x' || substr(md5(shingle || ':' || j::VARCHAR), 1, 15))::BIGINT % 65536 AS pos
         |       FROM doc CROSS JOIN js),
         |hit AS (SELECT d.doc_id, d.shingle, bool_and(b.pos IS NOT NULL) AS hit
         |        FROM dp d LEFT JOIN bpos b ON d.pos = b.pos
         |        GROUP BY d.doc_id, d.shingle),
         |sz AS (SELECT doc_id, count(*) AS sz, count(*) FILTER (WHERE hit) AS h
         |       FROM hit GROUP BY doc_id)
         |SELECT a.doc_id,
         |       round(CASE WHEN coalesce(sz, 0) = 0 THEN 0.0
         |             ELSE coalesce(h, 0)::DOUBLE / sz END, 6) AS bloom_containment
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) a
         |LEFT JOIN sz USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val bits = Bloom.build(docs.filter(col("doc_id") < 20), "text",
        n = 3, mBits = 1 << 16, kProbes = 3)
      Bloom.containmentScores(docs.filter(col("doc_id") >= 20), bits,
        "doc_id", "text", n = 3, kProbes = 3)
    },

    // ExactSubstr removal (Lee et al.): every token covered by a 4-gram
    // occurring more than once corpus-wide is excised; survivors rejoin in
    // order. The planted exact-duplicate docs lose their whole body; docs
    // under 4 tokens pass through whole. The oracle replays positional
    // grams, the >1 count, the covered-position union and the ordered
    // reassembly from first principles.
    GQuery(
      "q164_exactsubstr_removal",
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+3], ' ') AS gram
         |      FROM toks, UNNEST(range(1, len(t) - 2)) AS u(i)),
         |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         |cov AS (SELECT DISTINCT g.doc_id, g.pos + x.x AS p
         |        FROM g JOIN dup USING (gram), UNNEST(range(0, 4)) AS x(x)),
         |tokpos AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
         |           FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
         |agg AS (SELECT tk.doc_id,
         |               coalesce(string_agg(tok, ' ' ORDER BY tk.p)
         |                 FILTER (WHERE c.p IS NULL), '') AS text,
         |               count(*) FILTER (WHERE c.p IS NOT NULL) AS n_removed
         |        FROM tokpos tk LEFT JOIN cov c
         |          ON c.doc_id = tk.doc_id AND c.p = tk.p
         |        GROUP BY tk.doc_id)
         |SELECT d.doc_id, coalesce(agg.text, '') AS text,
         |       coalesce(agg.n_removed, 0) AS n_removed
         |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin) { (s, dir) =>
      Dedup.removeDuplicatedSpans(Tables.documents(s, dir), "doc_id", "text",
        w = 4)
    },

    // The full D4 recipe (Tirumala et al.) under ONE oracle: cluster-shard
    // the corpus (with planted near-dups), SemDeDup within cells (CC ->
    // keep-min), then prototypicality-prune the survivors per cell against
    // the same centroids. The CTE chain replays all three stages — cell
    // argmin, per-cell cosine pairs, recursive closure, keep rule, round-6
    // proto rank and the ceil-fraction drop — so a green row proves the
    // composed pipeline end-to-end.
    GQuery(
      "q165_d4_pipeline",
      s"""WITH RECURSIVE u AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000,
         |         list_transform(embedding, x -> (x::DOUBLE * 0.9 + 0.01)::FLOAT)
         |  FROM embeddings WHERE vec_id < 40),
         |cen AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |               embedding AS ce
         |        FROM (SELECT * FROM u ORDER BY vec_id LIMIT 8)),
         |r AS (SELECT e.vec_id, e.embedding AS v, cen.cell,
         |             ${duckL2Sq("e.embedding", "cen.ce")} AS d,
         |             row_number() OVER (PARTITION BY e.vec_id
         |                                ORDER BY ${duckL2Sq("e.embedding", "cen.ce")}, cen.cell) AS rn
         |      FROM u e CROSS JOIN cen),
         |asg AS (SELECT vec_id, v, cell, round(sqrt(d), 6) AS proto FROM r WHERE rn = 1),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      WHERE ${duckCosine("a.v", "b.v")} >= 0.95),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, rr) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.t, reach.rr FROM reach JOIN edges e ON e.s = reach.id),
         |lab AS (SELECT id, min(rr) AS cluster FROM reach GROUP BY id),
         |keepers AS (SELECT u.vec_id FROM u LEFT JOIN lab ON lab.id = u.vec_id
         |            WHERE coalesce(lab.cluster, u.vec_id) = u.vec_id),
         |rk AS (SELECT k.vec_id, a.cell, a.proto,
         |              row_number() OVER (PARTITION BY a.cell
         |                                 ORDER BY a.proto, k.vec_id) AS rnk,
         |              count(*) OVER (PARTITION BY a.cell) AS cnt
         |       FROM keepers k JOIN asg a USING (vec_id))
         |SELECT vec_id, cell, proto FROM rk WHERE rnk > ceil(cnt * 0.25)""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val perturbed = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * 0.9 + 0.01).cast("float")).as("embedding"))
      val corpus = emb.unionByName(perturbed)
      val init = corpus.orderBy("vec_id").limit(8)
        .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("cell"), col("embedding").as("centroid"))
      val dedup = Dedup.semanticDedupSharded(corpus, "vec_id", "embedding",
        threshold = 0.95, centroids = init)
      val kept = corpus.join(
        dedup.filter(col("keep")).select(col("id").as("vec_id")),
        Seq("vec_id"), "left_semi")
      Clustering.prototypicalityPrune(kept, init, dropFrac = 0.25,
        metric = "EUCLIDEAN")
    },

    // Split-leak audit: deterministically split the corpus 80/20, then
    // score every TEST document's 3-gram containment against the TRAIN
    // shingle set — the after-the-fact contamination check a train/eval
    // separation needs (planted duplicate docs that land on opposite
    // sides of the split surface with containment 1.0). One oracle
    // replays the split hash AND the containment join, so the green row
    // pins the composition.
    GQuery(
      "q180_split_leak_audit",
      s"""WITH sp AS (SELECT doc_id,
         |              CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 1000000 < 800000
         |                   THEN 'train' ELSE 'test' END AS split
         |            FROM documents),
         |toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
         |          i -> array_to_string(t[i:i+2], ' '))) AS sh
         |        FROM toks WHERE len(t) >= 3),
         |te AS (SELECT s.doc_id, unnest(sh) AS shingle
         |       FROM sh0 JOIN sp s USING (doc_id) WHERE s.split = 'test'),
         |tr AS (SELECT DISTINCT unnest(sh) AS shingle
         |       FROM sh0 JOIN sp s USING (doc_id) WHERE s.split = 'train'),
         |sz AS (SELECT doc_id, count(*) AS sz FROM te GROUP BY 1),
         |hits AS (SELECT te.doc_id, count(*) AS h FROM te
         |         JOIN tr ON te.shingle = tr.shingle GROUP BY 1)
         |SELECT a.doc_id,
         |       round(CASE WHEN coalesce(sz, 0) = 0 THEN 0.0
         |             ELSE coalesce(h, 0)::DOUBLE / sz END, 6) AS containment
         |FROM (SELECT doc_id FROM sp WHERE split = 'test') a
         |LEFT JOIN sz USING (doc_id)
         |LEFT JOIN hits USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sp = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "test" -> 0.2))
      Dedup.containmentScores(
          sp.filter(col("split") === "test"),
          sp.filter(col("split") === "train"),
          "doc_id", "text", n = 3)
        .select(col("id").as("doc_id"),
          round(col("containment"), 6).as("containment"))
    },

    // Per-document novelty (1 − max Jaccard vs any other doc): the
    // inverse-dup weighting signal. Pairs above 0.3 come from the same
    // inverted-index generator as q45; docs with no qualifying pair are
    // maximally novel. Oracle replays pairs + the two-sided max + the
    // corpus-wide left join.
    GQuery(
      "q183_novelty_scores",
      s"""WITH p AS (${jaccardPairsSql(0.3)}),
         |m AS (SELECT id, max(j) AS mx FROM (
         |        SELECT id_a AS id, jaccard AS j FROM p
         |        UNION ALL
         |        SELECT id_b AS id, jaccard AS j FROM p)
         |      GROUP BY id)
         |SELECT d.doc_id, round(1.0 - coalesce(m.mx, 0.0), 6) AS novelty
         |FROM documents d LEFT JOIN m ON m.id = d.doc_id""".stripMargin) { (s, dir) =>
      Dedup.noveltyScores(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.3)
        .withColumnRenamed("id", "doc_id")
    },

    // Quality-aware representative selection: near-dup clusters (3-gram
    // Jaccard >= 0.8 -> connected components) keep their LONGEST member
    // (ties -> lowest id) instead of the arbitrary min-id — the rule real
    // curation pipelines want (keep the best copy, drop the rest). The
    // oracle replays pairs, the recursive closure, the per-cluster argmax
    // and the corpus-wide labeling; singletons cluster to themselves and
    // are kept.
    GQuery(
      "q169_keep_best_dedup",
      s"""WITH RECURSIVE p AS (${jaccardPairsSql(0.8)}),
         |edges AS (
         |  SELECT id_a AS s, id_b AS t FROM p
         |  UNION ALL
         |  SELECT id_b AS s, id_a AS t FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.id),
         |cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |rk AS (SELECT cl.id, cl.cluster,
         |              row_number() OVER (PARTITION BY cl.cluster
         |                ORDER BY d.n_chars DESC, cl.id) AS rn
         |       FROM cl JOIN documents d ON d.doc_id = cl.id)
         |SELECT d.doc_id, coalesce(rk.cluster, d.doc_id) AS cluster_id,
         |       coalesce(rk.rn = 1, true) AS kept
         |FROM documents d LEFT JOIN rk ON rk.id = d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      Dedup.keepBestPerCluster(docs, "doc_id", "n_chars", pairs)
        .withColumnRenamed("id", "doc_id")
    },

    // Suffix-array-true ExactSubstr (Lee et al. 2022) at CHARACTER level:
    // every code point covered by a duplicated substring of length >= 40,
    // at any alignment, is excised — q164's token-gram form misses
    // duplicates short in tokens or off token boundaries. The oracle
    // replays the window identity from first principles: length-40 char
    // windows, the corpus-wide >1 count on the window VALUE (so a Spark
    // hash collision would be caught as a mismatch), the covered-position
    // union and the character-by-character reassembly.
    GQuery(
      "q189_exactsubstr_char",
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |pos AS (SELECT doc_id, i - 1 AS pos, substr(text, i, 40) AS win
         |        FROM d, UNNEST(range(1, length(text) - 38)) AS u(i)
         |        WHERE length(text) >= 40),
         |dup AS (SELECT win FROM pos GROUP BY win HAVING count(*) > 1),
         |cov AS (SELECT DISTINCT p.doc_id, p.pos + x.x AS cp
         |        FROM pos p JOIN dup USING (win), UNNEST(range(0, 40)) AS x(x)),
         |chars AS (SELECT doc_id, i - 1 AS cp, substr(text, i, 1) AS ch
         |          FROM d, UNNEST(range(1, length(text) + 1)) AS u(i)),
         |agg AS (SELECT ch.doc_id,
         |               coalesce(string_agg(ch.ch, '' ORDER BY ch.cp)
         |                 FILTER (WHERE c.cp IS NULL), '') AS text,
         |               count(*) FILTER (WHERE c.cp IS NOT NULL) AS n_removed
         |        FROM chars ch LEFT JOIN cov c
         |          ON c.doc_id = ch.doc_id AND c.cp = ch.cp
         |        GROUP BY ch.doc_id)
         |SELECT d.doc_id, coalesce(agg.text, '') AS text,
         |       coalesce(agg.n_removed, 0) AS n_removed
         |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin) { (s, dir) =>
      Dedup.removeExactSubstrChar(Tables.documents(s, dir), "doc_id", "text",
        minLen = 40)
    },

    // KEEP-FIRST ExactSubstr: per duplicated 40-char window the lowest
    // (doc_id, pos) occurrence survives, every other occurrence excises —
    // one copy of legitimate shared text remains (q189's remove-all form
    // deletes the canonical copy too). The oracle replays the canonical
    // pick on the window VALUE (row_number over (doc_id, pos) per window —
    // a Spark hash collision would surface as a mismatch), the covered-
    // position union over NON-canonical occurrences only, and the
    // reassembly.
    GQuery(
      "q231_exactsubstr_keepfirst",
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |pos AS (SELECT doc_id, i - 1 AS pos, substr(text, i, 40) AS win
         |        FROM d, UNNEST(range(1, length(text) - 38)) AS u(i)
         |        WHERE length(text) >= 40),
         |occ AS (SELECT doc_id, pos,
         |               row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,
         |               count(*) OVER (PARTITION BY win) AS c
         |        FROM pos),
         |noncanon AS (SELECT doc_id, pos FROM occ WHERE c > 1 AND rn > 1),
         |cov AS (SELECT DISTINCT p.doc_id, p.pos + x.x AS cp
         |        FROM noncanon p, UNNEST(range(0, 40)) AS x(x)),
         |chars AS (SELECT doc_id, i - 1 AS cp, substr(text, i, 1) AS ch
         |          FROM d, UNNEST(range(1, length(text) + 1)) AS u(i)),
         |agg AS (SELECT ch.doc_id,
         |               coalesce(string_agg(ch.ch, '' ORDER BY ch.cp)
         |                 FILTER (WHERE c.cp IS NULL), '') AS text,
         |               count(*) FILTER (WHERE c.cp IS NOT NULL) AS n_removed
         |        FROM chars ch LEFT JOIN cov c
         |          ON c.doc_id = ch.doc_id AND c.cp = ch.cp
         |        GROUP BY ch.doc_id)
         |SELECT d.doc_id, coalesce(agg.text, '') AS text,
         |       coalesce(agg.n_removed, 0) AS n_removed
         |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin) { (s, dir) =>
      Dedup.removeExactSubstrCharKeepFirst(Tables.documents(s, dir),
        "doc_id", "text", minLen = 40)
    },

    // Edit-distance-VERIFIED near-dup pairs: low-threshold Jaccard
    // candidates (recall), then banded Levenshtein <= 50 (precision) —
    // at sf0.01 the verify genuinely rejects candidates (dist up to ~87),
    // so a green hash proves BOTH stages. The oracle restricts to the
    // ASCII slice (strlen = length), where DuckDB's byte-level levenshtein
    // and Spark's char-level one coincide; the Spark side applies the
    // same restriction so the compared relations are identical.
    GQuery(
      "q197_edit_verified_neardup",
      """WITH docs AS (SELECT doc_id, text FROM documents
        |              WHERE strlen(text) = length(text)),
        |toks AS (SELECT doc_id,
        |                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
        |         FROM docs),
        |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |          i -> array_to_string(t[i:i+2], ' '))) AS sh
        |        FROM toks WHERE len(t) >= 3),
        |sh AS (SELECT doc_id, unnest(sh) AS shingle FROM sh0),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |j AS (SELECT ia AS id_a, ib AS id_b,
        |             c::DOUBLE / (sa.sz + sb.sz - c) AS jacc
        |      FROM inter JOIN sz sa ON sa.doc_id = ia
        |                 JOIN sz sb ON sb.doc_id = ib
        |      WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.05)
        |SELECT id_a, id_b, round(jacc, 6) AS jaccard,
        |       levenshtein(a.text, b.text)::BIGINT AS edit_dist
        |FROM j JOIN docs a ON a.doc_id = j.id_a
        |       JOIN docs b ON b.doc_id = j.id_b
        |WHERE levenshtein(a.text, b.text) <= 50""".stripMargin) { (s, dir) =>
      val ascii = Tables.documents(s, dir)
        .filter(octet_length(col("text")) === length(col("text")))
      Dedup.editVerifiedNearDupPairs(ascii, "doc_id", "text", n = 3,
        candidateThreshold = 0.05, maxDist = 50)
    },

    // INCREMENTAL LSH dedup: corpus docs (doc_id % 5 != 0) are pre-indexed
    // (minhashIndex — the persisted artifact); the "ingest batch"
    // (doc_id % 5 = 0) probes it. Output = every verified pair TOUCHING
    // the batch. The oracle brute-forces exact Jaccard over the full
    // corpus and keeps pairs with a batch member — so a green hash is
    // simultaneously the recall proof (no band miss) and the no-buffered-
    // duplicate proof (nothing emitted twice from the new×new side).
    GQuery(
      "q198_incremental_lsh_dedup",
      s"""SELECT id_a, id_b, jaccard FROM (
         |${jaccardPairsSql(0.8)}
         |) WHERE id_a % 5 = 0 OR id_b % 5 = 0""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val oldIdx = Dedup.minhashIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text")
      val newIdx = Dedup.minhashIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      Dedup.minhashLshPairsIncremental(oldIdx, newIdx,
          numPerms = 128, bands = 32, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    },

    // LSH S-CURVE CALIBRATION: per (bands, rowsPerBand) config × exact-
    // Jaccard bucket, the EMPIRICAL band-collision detection fraction on
    // real minhash signatures beside the theoretical 1-(1-s^r)^b — the
    // instrument that picks banding geometry for a target similarity
    // threshold before a full dedup run commits to it. Runs on a
    // deterministic doc sample (doc_id % 2 = 0); signatures are
    // min-over-shingles of md5-60(shingle:perm), so the WHOLE card —
    // shingles, pairs, signatures, band hits, both rollup columns —
    // replays in DuckDB.
    GQuery(
      "q254_lsh_scurve_card",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0 AND doc_id < 500),
        |tk AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS t FROM d),
        |shl AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS sh
        |        FROM tk WHERE len(t) >= 3),
        |sh AS (SELECT doc_id, unnest(sh) AS shingle FROM shl),
        |sz AS (SELECT doc_id, len(sh) AS sz FROM shl),
        |pr AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |pj AS (SELECT ia, ib, inter::DOUBLE / (sa.sz + sb.sz - inter) AS s
        |       FROM pr JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib),
        |pp AS (SELECT unnest(range(0, 24)) AS p),
        |sg0 AS (SELECT sh.doc_id, pp.p,
        |          min(('0x' || substr(md5(sh.shingle || ':' || pp.p::VARCHAR), 1, 15))::BIGINT) AS h
        |        FROM sh CROSS JOIN pp GROUP BY 1, 2),
        |sg AS (SELECT doc_id, list(h ORDER BY p) AS sig FROM sg0 GROUP BY doc_id),
        |pjs AS (SELECT pj.ia, pj.ib, pj.s, a.sig AS siga, b.sig AS sigb,
        |               least(floor(pj.s * 5), 4)::BIGINT AS bucket
        |        FROM pj JOIN sg a ON a.doc_id = pj.ia JOIN sg b ON b.doc_id = pj.ib),
        |cfg AS (SELECT * FROM (VALUES (8, 3), (4, 6), (12, 2)) AS t(b, r)),
        |det AS (SELECT cfg.b, cfg.r, pjs.bucket, pjs.s,
        |               len(list_filter(range(0, cfg.b),
        |                   bi -> list_slice(siga, bi*cfg.r + 1, bi*cfg.r + cfg.r)
        |                       = list_slice(sigb, bi*cfg.r + 1, bi*cfg.r + cfg.r))) > 0 AS hit
        |        FROM pjs CROSS JOIN cfg)
        |SELECT 'b=' || b::VARCHAR || ',r=' || r::VARCHAR AS config,
        |       b::BIGINT AS bands, r::BIGINT AS rows_per_band, bucket,
        |       count(*) AS n_pairs,
        |       round(avg(CASE WHEN hit THEN 1.0 ELSE 0.0 END), 6) AS detected_frac,
        |       round(avg(1.0 - pow(1.0 - pow(s, r), b)), 6) AS theory_p
        |FROM det GROUP BY b, r, bucket""".stripMargin) { (s, dir) =>
      // FIXED-SIZE calibration sample (the card is a statistical
      // instrument — its cost must not scale with the corpus)
      val docs = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 0 && col("doc_id") < 500)
      Dedup.lshCalibrationCard(docs, "doc_id", "text", n = 3, numPerms = 24,
        configs = Seq((8, 3), (4, 6), (12, 2)), nBuckets = 5)
    },

    // Split-hygiene audit: the q46 near-dup pair relation joined against
    // the q102 hash split — pairs crossing train/val/test are test-set
    // contamination a per-document hash split cannot prevent. The oracle
    // chains both replayed forms (shingle-Jaccard pairs + the md5
    // cumulative-threshold CASE) and the least/greatest canonicalization.
    GQuery(
      "q324_split_leakage",
      s"""WITH pr AS (${jaccardPairsSql(0.8)}),
         |asg AS (SELECT doc_id,
         |          CASE WHEN u < 800000 THEN 'train'
         |               WHEN u < 900000 THEN 'val'
         |               ELSE 'test' END AS split
         |        FROM (SELECT doc_id,
         |                ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 1000000 AS u
         |              FROM documents)),
         |bp AS (SELECT least(a.split, b.split) AS split_a,
         |              greatest(a.split, b.split) AS split_b, count(*) AS pairs
         |       FROM pr JOIN asg a ON a.doc_id = pr.id_a
         |       JOIN asg b ON b.doc_id = pr.id_b
         |       GROUP BY 1, 2),
         |t AS (SELECT sum(pairs) AS tot FROM bp)
         |SELECT split_a, split_b, pairs,
         |       round(pairs::DOUBLE / t.tot, 6) AS frac,
         |       split_a != split_b AS cross_split
         |FROM bp CROSS JOIN t""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numPerms = 128, bands = 32, threshold = 0.8)
      val assign = graft.operators.Sampling.assignSplit(docs.select("doc_id"),
        keyCol = "doc_id", splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      graft.operators.Sampling.splitLeakage(pairs, assign)
    },
  )
}
