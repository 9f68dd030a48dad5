package graft.layout

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.xvec.{XvecFormat, XvecIO}

/** The TestDataGroup/TestDataView analogue (SURVEY.md §3.1, P1, J1, J7;
  * reference discovery/TestDataGroup.java:75-386): a dataset directory with
  * a `dataset.yaml` manifest exposing named profiles, each binding facets
  * (base/query/indices/distances/…) to windowed xvec/parquet sources.
  *
  * `facet` returns the windowed DataFrame with BOTH ordinals: `ordinal` =
  * logical (contiguous within the window — what the reference's DatasetView
  * exposes) and `physical_ordinal` = raw file position.
  */
class GraftDataset(spark: SparkSession, dir: String, entry: Catalog.DatasetEntry) {

  def profiles: Seq[String] = entry.profiles.keys.toSeq.sorted
  def attributes: Map[String, String] = entry.attributes

  def profile(name: String): GraftProfile =
    new GraftProfile(spark, dir,
      entry.profiles.getOrElse(name,
        throw new NoSuchElementException(
          s"no profile '$name' in ${entry.name}; have: ${profiles.mkString(",")}")))
}

class GraftProfile(spark: SparkSession, dir: String, profile: Catalog.Profile) {

  def facets: Seq[String] = profile.facets.keys.toSeq.sorted

  /** One facet as a DataFrame (P1 projection + P2 window application). */
  def facet(canonicalName: String): DataFrame = {
    val fs = profile.facets.getOrElse(
      Catalog.facetAliases.getOrElse(canonicalName, canonicalName),
      throw new NoSuchElementException(s"no facet '$canonicalName'; have: ${facets.mkString(",")}"))
    val path = s"$dir/${fs.path}"
    val raw =
      if (fs.path.endsWith(".parquet")) {
        val base = spark.read.parquet(path)
        // contiguous ordinals are the windowing contract; reuse a stored
        // ordinal column when present, else number rows in file order via
        // the two-pass per-partition-offset primitive — an ordinal-less
        // facet load is a CORE read path, and a global row_number window
        // here would funnel the whole facet through one partition
        val withOrd =
          if (base.columns.contains("ordinal")) base
          else graft.operators.Ranking.fileOrderOrdinal(base, "ordinal")
        // facet payload column: explicit `vector`, else the first array column
        if (withOrd.columns.contains("vector")) withOrd
        else {
          val vecCol = withOrd.schema.fields.collectFirst {
            case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => f.name
          }.getOrElse(throw new IllegalArgumentException(
            s"$path: no `vector` or array-typed column for facet"))
          withOrd.withColumnRenamed(vecCol, "vector")
        }
      } else XvecIO.read(spark, path)
    val windowed = raw.filter(fs.window.predicate(col("ordinal")))
    windowed.select(
      fs.window.logicalOrdinal(col("ordinal")).as("ordinal"),
      col("ordinal").as("physical_ordinal"),
      col("vector"))
  }

  /** J1 facet zip-join: parallel facet arrays equi-joined on the shared
    * logical ordinal (ordinal_predicate_writers_v1.md:23-30): query[i] ↔
    * indices[i] ↔ distances[i].
    */
  def zipped(facetNames: String*): DataFrame = {
    val frames = facetNames.map { n =>
      facet(n).select(col("ordinal"), col("vector").as(s"${n}_vector"))
    }
    frames.reduce((a, b) => a.join(b, Seq("ordinal")))
  }
}

object GraftDataset {

  /** Open a dataset directory containing dataset.yaml. */
  def load(spark: SparkSession, dir: String): GraftDataset = {
    val yamlPath = Paths.get(dir, "dataset.yaml")
    require(Files.exists(yamlPath), s"no dataset.yaml in $dir")
    val entry = Catalog.parseDatasetYaml(
      Paths.get(dir).getFileName.toString,
      new String(Files.readAllBytes(yamlPath), "UTF-8"))
    new GraftDataset(spark, dir, entry)
  }
}
