package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // see Verify.scala: keep bounded-heap aggregates in hash mode past
      // 128 grouping keys (sort-based fallback sorts the raw pair stream)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      // the default 100-entry codegen cache thrashes under a 143-query
      // sweep (every sweep recompiles every generated class — measured as
      // uniform per-query inflation vs small sweeps; see PLANS.md bench
      // protocol); size it to hold the whole suite's codegen units
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/JIT/codegen + parquet reader init are process
    // costs, not plan costs — without this the alphabetically-first query
    // absorbs ~4s of one-time setup
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.mode("overwrite").format("noop").save()
      // JIT-warm the hot typed kernels (tokenize/shingle-hash, vector
      // distance) on a small slice so the first dedup/KNN query measures
      // its plan, not first-compile of the kernel bytecode
      import org.apache.spark.sql.functions._
      graft.operators.Dedup.hashedShingleSets(
          Tables.documents(spark, sfDir).limit(2000), "doc_id", "text", 3)
        .write.mode("overwrite").format("noop").save()
      val emb = Tables.embeddings(spark, sfDir).limit(500)
      graft.operators.Knn.knn(emb.limit(8), emb, k = 4)
        .write.mode("overwrite").format("noop").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // Optional subset for local profiling: SPARK_GRAFT_ONLY=q82,q45
    // Median of N full sweeps (default 3): a machine-load / page-cache /
    // JIT swing inflates one sweep, not the per-query median — round 5's
    // +27% "regression" on byte-identical code was exactly this artifact.
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "3").toInt
    require(sweeps >= 1, s"SPARK_GRAFT_SWEEPS must be >= 1, got $sweeps")
    def runSweep(): Seq[(String, Double)] =
      SparkEntry.selectedQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column —
        // count() would let Catalyst prune the computation under test
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e")
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    val bySweep = (1 to sweeps).map { i =>
      val r = runSweep()
      System.err.println(f"[bench] sweep $i/$sweeps total ${r.map(_._2).filter(_ >= 0).sum}%.1f s")
      // storage-memory snapshot: cached-block pressure in a 124-query JVM is
      // otherwise invisible — an evicted shingle/embedding cache silently
      // turns a 2s query into a recompute (the r6 q46/q45 drift signature)
      val rdds = spark.sparkContext.getRDDStorageInfo
      val (maxB, remB) = spark.sparkContext.getExecutorMemoryStatus
        .values.headOption.getOrElse((0L, 0L))
      System.err.println(
        f"[bench] storage-memory sweep $i: ${rdds.length} cached rdds " +
        f"${rdds.map(_.memSize).sum / 1e6}%.1f MB in-mem, " +
        f"${rdds.map(_.diskSize).sum / 1e6}%.1f MB spilled; " +
        f"pool ${(maxB - remB) / 1e6}%.1f / ${maxB / 1e6}%.1f MB used")
      // sweep isolation: drop caches accumulated across the query set so
      // every sweep measures sweep-1 behavior (a query's own cache build
      // still happens inside its own timing), not LRU state left by the
      // previous 123 queries
      spark.catalog.clearCache()
      // ...and make the isolation SYNCHRONOUS: clearCache issues async
      // RemoveRdd messages, so without this barrier the block-removal work
      // and the GC of the freed cache blocks land inside the FIRST queries
      // of the next sweep — measured in round 7 as a 2-3x inflation of the
      // alphabetically-early sub-second queries (q01/q02/q100) while
      // nothing in their plans changed. Wait for the storage pool to
      // drain, then take the GC hit here, outside any query's timing.
      val drainDeadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (spark.sparkContext.getRDDStorageInfo.nonEmpty &&
          System.nanoTime() < drainDeadline)
        Thread.sleep(50)
      System.gc()
      if (sys.env.get("SPARK_GRAFT_SWEEP_DETAIL").contains("1"))
        System.err.println(s"[bench-sweep $i] " + r.map { case (k, v) =>
          "\"" + k.takeWhile(_ != '_') + "\":" + (if (v < 0) "-1" else f"$v%.3f")
        }.mkString("{", ",", "}"))
      r
    }
    // per-query median; a query that failed ANY sweep reports -1
    val results = bySweep.head.map(_._1).map { name =>
      val ts = bySweep.map(_.toMap.apply(name))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(ts.size / 2))
    }
    // The driver retains only the last ~2000 chars of stdout; the full
    // query-name map with 9-decimal floats is ~3100 chars and its head got
    // truncated every round ("parsed": null in BENCH_r{1..3}.json). Emit a
    // compact line (qNN keys, 3-decimal secs, ~1300 chars) that fits whole,
    // and the full-precision map on stderr for local profiling.
    def f3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f3(v)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    System.err.println(s"""[bench-full] {"total":$total,"queries":$fullQs}""")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
