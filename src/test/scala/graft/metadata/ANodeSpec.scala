package graft.metadata

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.predicates.{Comparand, ConjugateNode, OpType, PredicateNode}

class ANodeSpec extends AnyFunSuite {

  test("mixed MNode/PNode stream round trip with dialect auto-detection") {
    val records: Seq[ANode.Record] = Seq(
      ANode.M(MNode(Seq("a" -> MValue.I64(1), "b" -> MValue.Str("x")))),
      ANode.P(PredicateNode.namedTyped("f", OpType.GT, Comparand.IntVal(5))),
      ANode.M(MNode(Nil)),
      ANode.P(ConjugateNode.or(
        PredicateNode.namedTyped("g", OpType.EQ, Comparand.NullVal),
        PredicateNode.namedTyped("h", OpType.MATCHES, Comparand.TextVal("a.*")))))
    assert(ANode.decode(ANode.encode(records)) == records)
  }

  test("corrupt frames rejected") {
    val good = ANode.encode(Seq(ANode.M(MNode(Seq("k" -> MValue.Bool(true))))))
    intercept[IllegalArgumentException](ANode.decode(good.dropRight(1)))
    val badDialect = good.clone(); badDialect(4) = 0x55
    intercept[IllegalArgumentException](ANode.decode(badDialect))
  }
}

class IvfIndexPersistenceSpec extends graft.SparkSpec {

  test("partitioned IVF index prunes probed cells at scan time") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val index = graft.operators.Ann.ivfIndex(emb, centroids)
    val path = s"target/ivf-${System.nanoTime()}"
    graft.operators.Ann.writeIndex(index, path)

    val back = graft.operators.Ann.readIndex(spark, path)
    assert(back.count() == emb.count())
    // a cell-restricted read must show partition filters in the plan
    val pruned = back.filter(col("cell") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    // and search over the persisted index equals search over the in-memory one
    val q = emb.filter(col("vec_id") < 3)
    val a = graft.operators.Ann.ivfSearch(q, index, centroids, k = 3, nProbe = 8, excludeSelf = true)
      .select("query_id", "neighbor_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = graft.operators.Ann.ivfSearch(q, back, centroids, k = 3, nProbe = 8, excludeSelf = true)
      .select("query_id", "neighbor_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("ivfSearchPersisted: the scan reads ONLY the probed partitions (measured)") {
    import graft.operators.Ann
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val index = Ann.ivfIndex(emb, centroids)
    val path = s"target/ivf-pruned-${System.nanoTime()}"
    Ann.writeIndex(index, path)

    val q = emb.filter(col("vec_id") < 3)
    val cells = Ann.probedCells(q, centroids, nProbe = 2)
    assert(cells.length >= 1 && cells.length <= 6) // ≤ 3 queries × 2 probes

    val search = Ann.ivfSearchPersisted(q, path, centroids, k = 3, nProbe = 2,
      excludeSelf = true)
    val rows = search.collect()
    assert(rows.nonEmpty)

    // the parquet scan's partition filter is a LITERAL cell IN (...) and
    // its measured partition count equals the probed-cell set — not the
    // full nList
    // recurse through AQE wrappers (AdaptiveSparkPlanExec and QueryStageExec
    // are collect() boundaries)
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val scans = fileScans(search.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(path)))
    assert(scans.nonEmpty, search.queryExecution.executedPlan.toString)
    val scan = scans.head
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
    val nParts = scan.metrics.get("numPartitions").map(_.value)
      .getOrElse(scan.metrics("numFiles").value)
    val total = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("cell="))
    assert(total == 8, s"expected 8 cell partitions, got $total")
    assert(nParts == cells.length,
      s"scan read $nParts partitions, probed ${cells.length} of $total")

    // and the pruned search equals the unpruned one
    val want = Ann.ivfSearch(q, index, centroids, k = 3, nProbe = 2,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet == want)
  }

  test("bundle: write 80%, appendToBundle 20%, serve == full in-memory search; append touches only slice cells") {
    import graft.operators.Ann
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val old = emb.filter(col("vec_id") < 400)
    val slice = emb.filter(col("vec_id") >= 400)
    val path = s"target/ivf-bundle-${System.nanoTime()}"
    Ann.writeIndexBundle(Ann.ivfIndex(old, centroids), centroids, path)

    def cellFiles(): Map[String, Set[String]] =
      new java.io.File(s"$path/cells").listFiles()
        .filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    val before = cellFiles()

    Ann.appendToBundle(slice, path)
    val after = cellFiles()
    // untouched cells keep their exact file sets; the slice's cells gain
    val sliceCells = Ann.ivfIndex(slice, centroids)
      .select("cell").distinct().collect().map("cell=" + _.getLong(0)).toSet
    before.foreach { case (cell, files) =>
      if (sliceCells.contains(cell))
        assert(files.subsetOf(after(cell)) && after(cell).size > files.size, cell)
      else assert(after(cell) == files, s"$cell changed without appended rows")
    }

    val q = emb.filter(col("vec_id") < 3)
    val got = Ann.searchBundle(q, path, k = 4, nProbe = 3, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Ann.ivfSearch(q, Ann.ivfIndex(emb, centroids), centroids,
        k = 4, nProbe = 3, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("bundle tombstones hide immediately; compact reclaims; every crash step recovers") {
    import graft.operators.Ann
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val q = emb.filter(col("vec_id") < 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = key(Ann.ivfSearch(q,
      Ann.ivfIndex(emb.filter(col("vec_id") % 5 =!= 4), centroids), centroids,
      k = 4, nProbe = 3, excludeSelf = true))

    def freshBundle(): String = {
      val p = s"target/ivf-tomb-${System.nanoTime()}"
      Ann.writeIndexBundle(Ann.ivfIndex(emb, centroids), centroids, p)
      Ann.deleteFromBundle(emb.filter(col("vec_id") % 5 === 4), p)
      p
    }

    // deletes hide immediately (same search results as a rebuild without
    // the tombstoned rows), live rows shrink, cells files untouched
    val p0 = freshBundle()
    assert(key(Ann.searchBundle(q, p0, k = 4, nProbe = 3, excludeSelf = true)) == want)
    assert(Ann.readBundleLive(spark, p0).count() == 400)

    // clean compact: results unchanged, tombstones gone, rows reclaimed
    Ann.compactBundle(spark, p0)
    assert(!new java.io.File(s"$p0/tombstones").exists())
    assert(spark.read.parquet(s"$p0/cells").count() == 400)
    assert(key(Ann.searchBundle(q, p0, k = 4, nProbe = 3, excludeSelf = true)) == want)

    // crash injected after EVERY step: reads recover, a rerun converges
    for (step <- 1 to 4) {
      val p = freshBundle()
      intercept[RuntimeException] {
        Ann.compactBundleWithFailpoint(spark, p, step)
      }
      assert(key(Ann.searchBundle(q, p, k = 4, nProbe = 3, excludeSelf = true)) == want,
        s"read after crash at step $step")
      if (step >= 2) {
        // past step 2 the post-compact generation is (or becomes, via
        // recovery) the live one, so the spent tombstones must be retired
        // by the read above — a re-appended previously-tombstoned id must
        // not be silently hidden in the pre-rerun-compact window
        assert(!new java.io.File(s"$p/tombstones").exists(),
          s"step $step: spent tombstones survived recovery")
      }
      Ann.compactBundle(spark, p) // rerun completes
      assert(!new java.io.File(s"$p/tombstones").exists(), s"step $step rerun")
      assert(spark.read.parquet(s"$p/cells").count() == 400, s"step $step rerun")
      assert(key(Ann.searchBundle(q, p, k = 4, nProbe = 3, excludeSelf = true)) == want,
        s"post-compact after crash at step $step")
    }
  }

  test("bundle recovery orders generations numerically, not lexicographically") {
    import graft.operators.Ann
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val p = s"target/ivf-stamp-${System.nanoTime()}"
    Ann.writeIndexBundle(Ann.ivfIndex(emb, centroids), centroids, p)
    val full = spark.read.parquet(s"$p/cells").count()

    // simulate a crash window with two complete generations whose
    // nanoTime stamps have DIFFERENT digit widths: lexicographically
    // "999" > "1000", so a string maxBy would revive the stale (older,
    // smaller) generation; numeric order must pick the newer full one
    val stale = Ann.ivfIndex(emb.filter(col("vec_id") < 100), centroids)
    stale.write.partitionBy("cell").parquet(s"$p/.cells-compact-999")
    assert(new java.io.File(s"$p/cells")
      .renameTo(new java.io.File(s"$p/.cells-compact-1000")))
    // a SPENT tombstone of the interrupted compact (already excluded from
    // the new generation's rows in a real crash) — must be retired
    import spark.implicits._
    Seq(0L).toDF("id").write.parquet(s"$p/tombstones")

    val recovered = Ann.readBundleLive(spark, p)
    assert(recovered.count() == full,
      "recovery picked the lexicographically-largest (stale) generation")
    assert(!new java.io.File(s"$p/tombstones").exists(),
      "spent tombstones survived generation recovery")
  }
}

class BundleFilteredSpec extends graft.SparkSpec {
  import graft.predicates._
  import Comparand._

  private def blob(ge: Long): Array[Byte] = PNodeCodec.encodeFramed(
    PredicateNode.namedTyped("label", OpType.GE, IntVal(ge)),
    PNodeCodec.Mode.NamedTyped)

  test("bundle filtered serving == in-memory filtered search; tombstones drop eligible ids; guaranteed fills lists") {
    import graft.operators.Ann
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("label", pmod(col("vec_id"), lit(10L)))
    val centroids = emb.filter(col("vec_id") < 8).select("vec_id", "embedding")
    val index = Ann.ivfIndexWithMeta(emb, centroids, metaCols = Seq("label"))
    val path = s"target/bundle-flt-${System.nanoTime()}"
    Ann.writeIndexBundle(index, centroids, path)
    val b5: Array[Byte] = blob(5) // capture the value, not the spec instance
    val bUdf = udf(() => b5)
    val q = emb.filter(col("vec_id") < 5).withColumn("predicate", bUdf())

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = key(Ann.ivfSearchFiltered(q, index, centroids, k = 5,
      nProbe = 4, metadataCols = Seq("label"), excludeSelf = true))
    val served = key(Ann.searchBundleFiltered(q, path, k = 5, nProbe = 4,
      metadataCols = Seq("label"), excludeSelf = true))
    assert(served == direct && served.nonEmpty)
    // every served neighbor satisfies the predicate
    val labelOf = emb.select(col("vec_id"), col("label"))
      .as[(Long, Long)].collect().toMap
    served.foreach { case (_, nid, _) => assert(labelOf(nid) >= 5L) }

    // tombstone two previously-returned neighbors: they vanish, parity
    // with a filtered search over the pruned in-memory index holds
    val dead = served.map(_._2).take(2).toSeq
    Ann.deleteFromBundle(dead.toDF("vec_id"), path)
    val after = key(Ann.searchBundleFiltered(q, path, k = 5, nProbe = 4,
      metadataCols = Seq("label"), excludeSelf = true))
    assert(after.forall(r => !dead.contains(r._2)))
    val prunedIdx = index.filter(!col("id").isInCollection(dead))
    assert(after == key(Ann.ivfSearchFiltered(q, prunedIdx, centroids, k = 5,
      nProbe = 4, metadataCols = Seq("label"), excludeSelf = true)))

    // guaranteed through the bundle: nProbe=1 starves under the filter;
    // every query still returns min(k, |eligible|) rows
    val g = Ann.searchBundleFiltered(q, path, k = 5, nProbe = 1,
      metadataCols = Seq("label"), excludeSelf = true, guaranteed = true)
    val perQ = g.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQ.length == 5 && perQ.forall(_ == 5L))
  }
}
