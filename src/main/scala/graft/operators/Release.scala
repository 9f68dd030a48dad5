package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus RELEASE — the composition that makes 100 TB
  * re-releases affordable: instead of re-running dedup, decontamination,
  * scoring and selection over the whole corpus for every refresh, only the
  * snapshot diff's added+changed slice is re-processed and the cached
  * artifacts of the previous release carry the rest. The invariant (q233's
  * oracle): the incremental output EQUALS the from-scratch pipeline on the
  * new corpus.
  *
  * Stages and why each is incremental-safe:
  *  1. [[Snapshot.diff]] — added/changed/removed per id (content hash).
  *  2. Near-dup pairs: verified MinHash-LSH pairs are a PAIRWISE property
  *     (band collision + Jaccard verify depend only on the two docs), so
  *     pairs between unchanged docs are reused verbatim from the previous
  *     release and only pairs TOUCHING the new slice are computed
  *     ([[Dedup.minhashLshPairsIncremental]] against the pruned persisted
  *     index — the q198 contract).
  *  3. Dedup survivors: a doc is dropped iff it has a verified pair with a
  *     LOWER id (the greedy one-hop rule, local to the pair set).
  *  4. Decontamination: containment is per-doc against a fixed benchmark —
  *     unchanged docs reuse their cached score, the new slice recomputes.
  *  5. Scores (distinct-token quality / token cost): per-doc, same reuse.
  *  6. Budget selection: the one GLOBAL recompute — deliberately the
  *     cheapest stage (one range shuffle over (score, cost) scalars, no
  *     text, no vectors: [[Sampling.budgetSelect]]'s no-Window prefix sum).
  *
  * Scale shape: stages 2-5 cost O(|new slice|) plus one broadcast/band
  * probe of the persisted index; nothing re-reads the unchanged corpus
  * text. Stage 6 shuffles only id+two-longs rows.
  */
object Release {

  /** Tunables shared by both paths (must match between the artifact build
    * and every later incremental release — the signature/band geometry is
    * part of the persisted-index contract).
    */
  final case class Params(
      n: Int = 3,
      numPerms: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      contamMax: Double = 0.5,
      budget: Long)

  /** The previous release's cached per-doc artifacts. `index` is the
    * persisted MinHash index ([[Dedup.minhashIndex]]); `pairs` its verified
    * near-dup pairs; `contam`/`scores` the per-doc decontamination and
    * quality/cost relations. All keyed by long `id`.
    */
  final case class Artifacts(index: DataFrame, pairs: DataFrame,
      contam: DataFrame, scores: DataFrame)

  /** (id, score = distinct tokens, cost = total tokens) — the deterministic
    * quality/cost proxies the selection stage budgets on. Docs with zero
    * tokens drop (cost 0 is unbudgetable — budgetSelect's documented rule).
    */
  def tokenScores(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        explode(split(lower(coalesce(col(textCol), lit(""))), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("id")
      .agg(count_distinct(col("tok")).as("score"), count(lit(1)).as("cost"))

  /** Near-dup survivors: ids with NO verified pair partner of lower id
    * (pairs carry id_a < id_b, so the dropped set is exactly {id_b}).
    */
  def dedupSurvivors(ids: DataFrame, pairs: DataFrame): DataFrame =
    ids.join(pairs.select(col("id_b").as("id")).distinct(), Seq("id"), "left_anti")

  /** Build the release artifacts for a corpus — the byproducts a release
    * run persists so the NEXT release can be incremental.
    *
    * ONE corpus shingle+signature pass: the index is built (and
    * materialized — it IS the persisted artifact) first, then pairs and
    * containment DERIVE from it ([[Dedup.minhashPairsFromIndex]] /
    * [[Dedup.containmentFromIndex]]) instead of re-scanning the corpus
    * text — previously three independent text scans (index, LSH pairs,
    * containment), identical kernels so identical outputs. tokenScores
    * is the one remaining extra text pass (tokens, not shingles).
    */
  def artifacts(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, p: Params): Artifacts = {
    val index = Materialize.view(
      Dedup.minhashIndex(corpus, idCol, textCol, p.n, p.numPerms))
    val pairs = Dedup.minhashPairsFromIndex(index, p.numPerms,
      p.bands, p.threshold)
    val contam = Dedup.containmentFromIndex(corpus.select(col(idCol)), index,
      bench, idCol, textCol, p.n)
    Artifacts(index, pairs, contam, tokenScores(corpus, idCol, textCol))
  }

  /** Selection from precomputed per-doc relations: dedup-survivor filter →
    * containment gate → budgeted greedy prefix in density order. Output:
    * (id, score, cost, cum_before).
    */
  private def select(ids: DataFrame, pairs: DataFrame, contam: DataFrame,
      scores: DataFrame, p: Params): DataFrame = {
    val surv = dedupSurvivors(ids, pairs)
      .join(contam.filter(col("containment") <= p.contamMax)
        .select("id"), Seq("id"), "left_semi")
      .join(scores, Seq("id"))
    Sampling.budgetSelect(surv, "id", "score", "cost", p.budget)
  }

  /** Selection from already-built artifacts — the path a caller that just
    * ran [[artifacts]] (to persist them for the NEXT release) uses, instead
    * of paying the corpus scans twice through [[fromScratch]].
    */
  def fromArtifacts(corpus: DataFrame, art: Artifacts, idCol: String,
      p: Params): DataFrame =
    select(corpus.select(col(idCol).cast("long").as("id")),
      art.pairs, art.contam, art.scores, p)

  /** Materialize the artifact frames (localCheckpoint) — the query-scale
    * stand-in for the production contract, where artifacts are PERSISTED
    * parquet between releases: every downstream consumer reads the
    * computed relations, never re-runs the corpus text scans.
    */
  def materialized(a: Artifacts): Artifacts = {
    // skip frames that already ARE materialized leaves (artifacts() now
    // checkpoints the index itself) — re-checkpointing would copy every
    // block for nothing
    Artifacts(Materialize.view(a.index), Materialize.view(a.pairs),
      Materialize.view(a.contam), Materialize.view(a.scores))
  }

  /** From-scratch release over one corpus (the baseline the incremental
    * path must equal).
    */
  def fromScratch(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, p: Params): DataFrame =
    fromArtifacts(corpus, artifacts(corpus, bench, idCol, textCol, p), idCol, p)

  /** Incremental release: previous corpus + its artifacts + the new corpus
    * version. Only the added+changed slice is signatured, decontaminated
    * and scored; removed/changed docs' cached rows are pruned; the global
    * budget re-selects over scalars. Returns the same (id, score, cost,
    * cum_before) contract as [[fromScratch]] on the new corpus — q233
    * pins the equality.
    */
  def incremental(oldCorpus: DataFrame, oldArt: Artifacts, newCorpus: DataFrame,
      bench: DataFrame, idCol: String, textCol: String, p: Params): DataFrame = {
    // materialize the shared frames ONCE: the diff feeds six consumers and
    // the new slice three — without truncation each consumer re-executes
    // the md5 text scans and the slice semi-join (measured: the composed
    // plan cost 5× the sum of its stages before this)
    val d = Materialize.view(Snapshot.diff(oldCorpus, newCorpus, idCol, textCol))
    val unchanged = Materialize.view(d.filter(col("status") === "unchanged")
      .select(col(idCol).cast("long").as("id")))
    val newSlice = Materialize.view(newCorpus.join(
      d.filter(col("status").isin("added", "changed")).select(idCol),
      Seq(idCol), "left_semi"))

    // pairs: unchanged×unchanged reused; everything touching the new slice
    // recomputed against the PRUNED index (changed/removed rows ejected)
    val reusedPairs = oldArt.pairs
      .join(unchanged.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
      .join(unchanged.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
    val prunedIndex = oldArt.index.join(unchanged, Seq("id"), "left_semi")
    val newIndex = Materialize.view( // consumed by band probe AND pair verification
      Dedup.minhashIndex(newSlice, idCol, textCol, p.n, p.numPerms))
    val pairs = reusedPairs.unionByName(
      Dedup.minhashLshPairsIncremental(prunedIndex, newIndex,
        p.numPerms, p.bands, p.threshold))

    // the new slice's containment derives from newIndex — its shingles
    // are already computed and materialized two lines up (one text scan
    // for the slice, not two); identical aggregation expressions
    val contam = oldArt.contam.join(unchanged, Seq("id"), "left_semi")
      .unionByName(Dedup.containmentFromIndex(newSlice.select(col(idCol)),
        newIndex, bench, idCol, textCol, p.n))
    val scores = oldArt.scores.join(unchanged, Seq("id"), "left_semi")
      .unionByName(tokenScores(newSlice, idCol, textCol))

    val ids = unchanged.unionByName(
      newSlice.select(col(idCol).cast("long").as("id")))
    select(ids, pairs, contam, scores, p)
  }

  /** The selection's SERVING INDEX (q242's composition as one call):
    * model-free hashed embeddings of the selected docs, assigned against a
    * bench-seeded frozen quantizer (the `nCells` lowest bench docs that
    * hash-embed). Returns `(id, vec, cell)` ready for [[Ann.writeIndex]]'s
    * cell-partitioned layout; an incremental release patches the previous
    * release's persisted index with [[Ann.ivfAppend]]/[[Ann.ivfDelete]]
    * deltas instead (q242 pins delta == from-scratch).
    */
  private def embedDocs(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    TfIdf.hashedEmbedding(docs, idCol, textCol, dim)
      .select(col(idCol).cast("long").as("vec_id"),
        col("hvec").cast("array<float>").as("embedding"))

  /** The release's frozen quantizer: the `nCells` lowest bench docs that
    * hash-embed. Part of the index's identity — maintenance deltas and
    * every probe must reuse it (ship it in the [[Ann.writeIndexBundle]]).
    */
  def selectionQuantizer(bench: DataFrame, idCol: String, textCol: String,
      dim: Int = 16, nCells: Int = 8): DataFrame =
    embedDocs(bench, idCol, textCol, dim).orderBy("vec_id").limit(nCells)

  def selectionIndex(corpus: DataFrame, selected: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, dim: Int = 16, nCells: Int = 8): DataFrame = {
    val sel = corpus.join(
      selected.select(col("id").cast("long").as(idCol)), Seq(idCol), "left_semi")
    Ann.ivfIndexWithMeta(embedDocs(sel, idCol, textCol, dim),
      selectionQuantizer(bench, idCol, textCol, dim, nCells),
      metric = "EUCLIDEAN")
  }

  /** TAKEDOWN sweep (right-to-be-forgotten): remove a set of doc ids from
    * the release AND every derived artifact, with zero text rescans — a
    * takedown is pure PRUNING, which is what makes it affordable at 100 TB
    * (cost is O(artifact rows touched), never a corpus pass):
    *
    *  - pairs: any pair touching a removed id is dropped. This is also
    *    where RESURRECTION comes from — a doc that was deduped away only
    *    because of a removed near-duplicate re-enters the candidate set
    *    (the kept copy must not vanish with the removed one).
    *  - index / contam / scores: per-doc rows anti-joined away, so the
    *    NEXT incremental release (and every band probe) can never match
    *    against removed content.
    *  - selection: re-run over the pruned scalars (one range shuffle; the
    *    freed budget re-fills from the remaining density order).
    *
    * Returns (new selection, pruned artifacts). Invariant (q250's oracle):
    * the new selection EQUALS the from-scratch pipeline on corpus ∖
    * removals — pairs are a pairwise property and contam/scores are
    * per-doc, so pruning commutes with recomputation.
    */
  def takedown(corpus: DataFrame, art: Artifacts, removals: DataFrame,
      idCol: String, p: Params): (DataFrame, Artifacts) = {
    val rem = Materialize.view(removals.select(col(idCol).cast("long").as("id")))
    val keepIds = corpus.select(col(idCol).cast("long").as("id"))
      .join(rem, Seq("id"), "left_anti")
    val pairs = art.pairs
      .join(rem.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_anti")
      .join(rem.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_anti")
    val pruned = Artifacts(
      art.index.join(rem, Seq("id"), "left_anti"),
      pairs,
      art.contam.join(rem, Seq("id"), "left_anti"),
      art.scores.join(rem, Seq("id"), "left_anti"))
    (select(keepIds, pruned.pairs, pruned.contam, pruned.scores, p), pruned)
  }

  /** Takedown COMPLETENESS audit — the card a compliance review reads:
    * per artifact, how many rows referenced a removed id BEFORE the sweep
    * (`refs_before`, the exposure) and how many still do AFTER
    * (`leftover`, which must be 0 — computed by actually scanning the
    * pruned outputs, not assumed). `selection` rows compare the old and
    * new release sets the same way.
    */
  def takedownAudit(oldSel: DataFrame, newSel: DataFrame, oldArt: Artifacts,
      prunedArt: Artifacts, removals: DataFrame, idCol: String): DataFrame = {
    val spark = removals.sparkSession
    import spark.implicits._
    val rem = Materialize.view(removals.select(col(idCol).cast("long").as("id")))
    def refs(df: DataFrame, c: String): Long =
      df.join(rem.withColumnRenamed("id", c), Seq(c), "left_semi").count()
    def pairRefs(df: DataFrame): Long =
      df.join(rem.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
        .unionByName(
          df.join(rem.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi"))
        .distinct().count()
    Seq(
      ("pairs", pairRefs(oldArt.pairs), pairRefs(prunedArt.pairs)),
      ("index", refs(oldArt.index, "id"), refs(prunedArt.index, "id")),
      ("contam", refs(oldArt.contam, "id"), refs(prunedArt.contam, "id")),
      ("scores", refs(oldArt.scores, "id"), refs(prunedArt.scores, "id")),
      ("selection", refs(oldSel, "id"), refs(newSel, "id")))
      .toDF("artifact", "refs_before", "leftover")
  }

  /** The release-set datasheet (what the selection ships with): doc count,
    * token volume, vocabulary size, mean chars — over the SELECTED docs.
    */
  def selectionDatasheet(selected: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // materialized once: the selected-docs frame feeds the token stats AND
    // the doc stats below — unmaterialized, the whole upstream selection
    // pipeline re-runs per aggregate leg
    val docs = Materialize.view(
      corpus.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
        .join(selected.select("id"), Seq("id"), "left_semi"))
    val toks = docs.select(explode(split(lower(col("t")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tokStats = toks.agg(count(lit(1)).as("n_tokens"),
      count_distinct(col("tok")).as("n_types"))
    docs.agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("t"))), 6).as("mean_chars"))
      .crossJoin(broadcast(tokStats))
      .select(col("n_docs"), col("n_tokens"), col("n_types"), col("mean_chars"))
  }
}
