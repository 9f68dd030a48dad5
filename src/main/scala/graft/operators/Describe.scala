package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.layout.GraftDataset

/** A3 `describe`: dataset structure summary — facet presence, record
  * counts, dimensions, attributes (reference
  * docs/user_manual/03-cli-reference.md:226-244). `--detailed` adds
  * per-facet vector stats via ProfileStats.
  */
object Describe {

  def dataset(spark: SparkSession, ds: GraftDataset, profileName: String,
      detailed: Boolean = false): DataFrame = {
    import spark.implicits._
    val prof = ds.profile(profileName)
    val rows = prof.facets.map { facetName =>
      val df = prof.facet(facetName)
      val (count, dim) = {
        val agg = df.agg(
          org.apache.spark.sql.functions.count(lit(1)),
          first(size(col("vector")))).collect()(0)
        (agg.getLong(0), if (agg.isNullAt(1)) -1 else agg.getInt(1))
      }
      val stats = if (detailed && dim > 0) {
        val s = df.agg(
          round(avg(graft.functions.VectorFunctions.vectorNorm(
            col("vector").cast("array<float>"))), 4)).collect()(0)
        s.getDouble(0)
      } else Double.NaN
      (facetName, count, dim, stats)
    }
    rows.toDF("facet", "records", "dim", "avg_norm")
      .withColumn("attributes",
        lit(ds.attributes.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")))
  }

  /** Corpus datasheet — the one-row card a dataset release ships with
    * (the "datasheets for datasets" summary distilled to what the engine
    * can attest): document and token volume, vocabulary size, language
    * count, exact-duplicate document count (by content hash), and the
    * token-length profile. Three aggregates total (corpus scalars, token
    * scalars, dup rollup) — no window, nothing collected but the card.
    */
  /** Deterministic Poisson-bootstrap CI for the corpus mean length — the
    * error bar a release card should carry. Each (doc, replicate) draws
    * a Poisson(1) weight from the md5 hash unit via FIXED integer CDF
    * thresholds (367879/735759/919699/981012/996340 of 1e6 — contract
    * constants, both engines use the literals), so every replicate mean
    * and the 5th/95th order statistics replay exactly. The scalable
    * bootstrap shape: B×n weighted rows collapse per replicate with
    * map-side combine; order statistics come from ONE bounded sorted
    * aggregate over the ≤B-row per-replicate relation. Replicates with
    * zero total weight (vanishing for n ≫ 10) drop out, documented.
    */
  def bootstrapMeanChars(docs: DataFrame, idCol: String, textCol: String,
      b: Int = 100): DataFrame = {
    require(b >= 20, s"bootstrap needs >= 20 replicates, got $b")
    val u = graft.operators.Sampling.hashUnit(
      concat(col(idCol).cast("string"), lit(":"), col("rep").cast("string")), "boot")
    val k = when(u < 367879L, 0L).when(u < 735759L, 1L).when(u < 919699L, 2L)
      .when(u < 981012L, 3L).when(u < 996340L, 4L).otherwise(5L)
    val perRep = docs
      .select(col(idCol), length(col(textCol)).cast("long").as("chars"))
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("k", k)
      .groupBy("rep")
      .agg(sum(col("k") * col("chars")).as("wsum"), sum("k").as("wn"))
      .filter(col("wn") > 0)
      .select(col("rep"), (col("wsum").cast("double") / col("wn")).as("m"))
    // order-statistic ranks derive from the SURVIVING replicate count, not
    // the nominal b: if replicates drop out (zero total Poisson weight,
    // possible for tiny corpora) the 95th rank of b rows may not exist.
    // The per-rep mean frame is <= b rows BY CONTRACT, so both order
    // statistics come from ONE bounded sorted aggregate (collect_list is
    // capped at b structs) — the previous distributed-rank form re-ran the
    // B×n exploded aggregation once per consumer branch (~5 scans; the
    // 2.6× q227 regression of round 10). A fully-degenerate input yields
    // null CI bounds beside the mean, never an empty card.
    val sorted = perRep
      .agg(sort_array(collect_list(struct(col("m"), col("rep")))).as("ms"))
      .select(col("ms"), size(col("ms")).cast("long").as("n_reps"))
    val loIdx = greatest(lit(1L), floor(col("n_reps") / 20).cast("long")).cast("int")
    val hiIdx = (col("n_reps") - floor(col("n_reps") / 20).cast("long")).cast("int")
    val ci = sorted.select(
      when(col("n_reps") > 0,
        round(element_at(col("ms"), loIdx).getField("m"), 6)).as("ci_lo"),
      when(col("n_reps") > 0,
        round(element_at(col("ms"), hiIdx).getField("m"), 6)).as("ci_hi"))
    docs.agg(round(avg(length(col(textCol))), 6).as("mean_chars"))
      .crossJoin(broadcast(ci))
  }

  def corpusDatasheet(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val toks = docs.select(
      explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tokStats = toks.agg(
      count(lit(1)).as("n_tokens"),
      count_distinct(col("term")).as("n_types"))
    val dupDocs = docs.select(md5(col(textCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum("c"), lit(0L)).as("n_exact_dup_docs"))
    val docStats = docs.agg(
      count(lit(1)).as("n_docs"),
      count_distinct(col(langCol)).as("n_langs"),
      round(avg(length(col(textCol))), 6).as("mean_chars"))
    docStats.crossJoin(broadcast(tokStats)).crossJoin(broadcast(dupDocs))
      .select(col("n_docs"), col("n_tokens"), col("n_types"), col("n_langs"),
        col("n_exact_dup_docs"), col("mean_chars"))
  }
}
