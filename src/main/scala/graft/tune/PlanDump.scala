package graft.tune

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 optimization instrumentation: dump `.explain("formatted")` for
  * named queries (and representative per-round step plans for the
  * iterative operators, whose query-level plans are materialized-leaf
  * chains) into plans/r15/<name>_<suffix>.txt. Usage:
  *   runMain graft.tune.PlanDump <suffix> <name>[,<name>...]
  * Names are either full query names (q287_pagerank) or the special step
  * probes: pagerank_step, labelprop_step, pageranksum_step.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = Paths.get("plans/r15")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      System.err.println(s"[plandump] wrote ${name}_$suffix.txt")
    }

    names.foreach {
      case "pagerank_step" =>
        // the per-round update plan — the thing the iterative queries pay
        // 10–50 times; the query-level explain only shows the final
        // materialized leaf chain
        val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            explode(array(lit(0), lit(1), lit(2))).as("j"))
          .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % n).as("dst"))
          .filter(col("dst") =!= col("src"))
        val ranks = docs.select(col("doc_id").as("id"),
          (lit(1.0) / n).as("rank")).localCheckpoint(true)
        dump("pagerank_step",
          graft.operators.PageRank.pageRankStep(edges, ranks))
      case "pagerank_round" =>
        // The PER-ROUND plan A/B, built expression-for-expression from the
        // two step shapes (old: ranks ⋈ e ⋈ outDeg per round; new:
        // ranks ⋈ eDeg with the deg join hoisted out of the loop and
        // cached). The one-shot pageRankStep probe cannot show this —
        // the deg join must still run once per CALL; inside the iterative
        // loop it runs once per QUERY instead of once per round.
        val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
        val n = docs.count()
        val e = docs.select(col("doc_id").as("src"),
            explode(array(lit(0), lit(1), lit(2))).as("j"))
          .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % n).as("dst"))
          .filter(col("dst") =!= col("src"))
          .distinct().withColumn("w", lit(1.0)).cache()
        val outDeg = e.groupBy("src").agg(sum(col("w")).as("deg")).cache()
        val eDeg = e.join(outDeg, "src").cache()
        eDeg.count() // populate caches as the loop does
        val nodes = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct().cache()
        val ranks = nodes.select(col("id"), (lit(1.0) / n).as("rank"))
          .localCheckpoint(true)
        def project(base: org.apache.spark.sql.DataFrame) =
          base.select(col("id"), (lit(0.15 / n) + lit(0.85) *
            coalesce(col("contrib"), lit(0.0))).as("rank"))
        val oldRound = project(nodes.join(
          ranks.join(e, col("id") === col("src")).join(outDeg, "src")
            .groupBy(col("dst").as("cid"))
            .agg(sum(col("rank") * col("w") / col("deg")).as("contrib")),
          col("id") === col("cid"), "left"))
        val newRound = project(nodes.join(
          ranks.join(eDeg, col("id") === col("src"))
            .groupBy(col("dst").as("cid"))
            .agg(sum(col("rank") * col("w") / col("deg")).as("contrib")),
          col("id") === col("cid"), "left"))
        dump("pagerank_round_old", oldRound)
        dump("pagerank_round_new", newRound)
      case "labelprop_step" =>
        // one full propagate call's plan is iterative; dump 1-iter run
        val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            explode(array(lit(0), lit(1), lit(2))).as("j"))
          .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % n).as("dst"))
          .filter(col("dst") =!= col("src"))
        val seeds = docs.filter(col("doc_id") < 10)
          .select(col("doc_id").as("id"), lit(1.0).as("label"))
        dump("labelprop_1iter",
          graft.operators.LabelProp.propagate(edges, seeds, iters = 1))
      case name =>
        graft.SparkEntry.queries.get(name) match {
          case Some(fn) => dump(name, fn(spark, sfDir))
          case None => System.err.println(s"[plandump] unknown query $name")
        }
    }
    spark.stop()
  }
}
