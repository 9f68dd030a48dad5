package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.LabelProp

/** Label-propagation queries over the same deterministic doc graph idiom
  * as q287 (different edge constant so the two graphs differ): ±1 quality
  * seeds on doc_id < 25 spread across the symmetrized graph. The oracle
  * unrolls all rounds as MATERIALIZED CTEs (the q287 lesson — each round
  * is referenced by the next and by the final select).
  */
object LabelPropQueries {

  private val iters = 8

  private def edgeFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    LabelProp.symmetrize(
      docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 3 + 7) % n).as("dst")))
  }

  private def seedFixture(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).filter(col("doc_id") < 25)
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)).as("label"))

  private val baseSql =
    """raw AS (SELECT doc_id AS src,
      |               (doc_id*3 + 7) % (SELECT count(*) FROM documents) AS dst
      |        FROM documents),
      |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM
      |  (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
      |odeg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
      |yf AS MATERIALIZED (
      |  SELECT d.doc_id AS id,
      |         CASE WHEN d.doc_id < 25 THEN
      |                CASE WHEN d.doc_id % 2 = 0 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END
      |              ELSE 0.0::DOUBLE END AS y
      |  FROM documents d),
      |f0 AS MATERIALIZED (SELECT id, y AS score FROM yf)""".stripMargin

  private val stepsSql: String = (1 to iters).map { t =>
    s"""f$t AS MATERIALIZED (
       |  SELECT yf.id,
       |         0.8::DOUBLE * coalesce(c.s, 0::DOUBLE)
       |         + (1::DOUBLE - 0.8::DOUBLE) * yf.y AS score
       |  FROM yf
       |  LEFT JOIN (SELECT e.dst AS id, sum(f.score / od.deg) AS s
       |             FROM f${t - 1} f JOIN edges e ON e.src = f.id
       |             JOIN odeg od ON od.src = e.src
       |             GROUP BY e.dst) c ON c.id = yf.id)""".stripMargin
  }.mkString(",\n")

  def all: Seq[GQuery] = Seq(

    // 8 anchored propagation rounds: every doc's inherited quality score.
    GQuery(
      "q291_labelprop",
      s"""WITH $baseSql,
         |$stepsSql
         |SELECT id AS doc_id, round(score, 6) AS score FROM f$iters""".stripMargin) {
      (s, dir) =>
      LabelProp.propagate(edgeFixture(s, dir), seedFixture(s, dir), iters)
        .select(col("id").as("doc_id"), round(col("score"), 6).as("score"))
    },

    // Spread card: how far did the +/- labels reach — signed buckets with
    // counts and mean magnitude (unreached docs stay at exactly 0).
    GQuery(
      "q292_labelprop_spread",
      s"""WITH $baseSql,
         |$stepsSql
         |SELECT CASE WHEN score > 0 THEN 1 WHEN score < 0 THEN -1 ELSE 0 END AS bucket,
         |       count(*) AS n_docs, round(avg(abs(score)), 6) AS mean_abs
         |FROM f$iters GROUP BY 1""".stripMargin) { (s, dir) =>
      LabelProp.propagate(edgeFixture(s, dir), seedFixture(s, dir), iters)
        .groupBy(when(col("score") > 0, lit(1)).when(col("score") < 0, lit(-1))
          .otherwise(lit(0)).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(abs(col("score"))), 6).as("mean_abs"))
    },

    // Edge-WEIGHTED propagation: contributions follow w(u,v)/Σ_out w —
    // the form that respects the similarity weights the dedup pair
    // emitters produce (strong cosine pairs conduct labels, borderline
    // ones barely do). Weights are the deterministic (src+dst)%5+1
    // (symmetric under direction flip, so the symmetrized graph is
    // consistent); the oracle is q291's chain with sum(w) degrees and
    // score·w/Σw contributions.
    GQuery(
      "q300_labelprop_weighted", {
        val wBase =
          """raw AS (SELECT doc_id AS src,
            |               (doc_id*3 + 7) % (SELECT count(*) FROM documents) AS dst
            |        FROM documents),
            |edges AS MATERIALIZED (
            |  SELECT DISTINCT src, dst, ((src + dst) % 5 + 1)::DOUBLE AS w FROM
            |    (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
            |odeg AS MATERIALIZED (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
            |yf AS MATERIALIZED (
            |  SELECT d.doc_id AS id,
            |         CASE WHEN d.doc_id < 25 THEN
            |                CASE WHEN d.doc_id % 2 = 0 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END
            |              ELSE 0.0::DOUBLE END AS y
            |  FROM documents d),
            |f0 AS MATERIALIZED (SELECT id, y AS score FROM yf)""".stripMargin
        val wSteps = (1 to iters).map { t =>
          s"""f$t AS MATERIALIZED (
             |  SELECT yf.id,
             |         0.8::DOUBLE * coalesce(c.s, 0::DOUBLE)
             |         + (1::DOUBLE - 0.8::DOUBLE) * yf.y AS score
             |  FROM yf
             |  LEFT JOIN (SELECT e.dst AS id, sum(f.score * e.w / od.deg) AS s
             |             FROM f${t - 1} f JOIN edges e ON e.src = f.id
             |             JOIN odeg od ON od.src = e.src
             |             GROUP BY e.dst) c ON c.id = yf.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $wBase,
           |$wSteps
           |SELECT id AS doc_id, round(score, 6) AS score FROM f$iters""".stripMargin
      }) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val raw = docs.select(col("doc_id").as("src"),
          ((col("doc_id") * 3 + 7) % n).as("dst"))
        .withColumn("w", ((col("src") + col("dst")) % 5 + 1).cast("double"))
      val weighted = LabelProp.symmetrizeWeighted(raw)
      LabelProp.propagate(weighted, seedFixture(s, dir), iters,
          weightCol = Some("w"))
        .select(col("id").as("doc_id"), round(col("score"), 6).as("score"))
    })
}
