package graft

import java.nio.file.{Files, Paths}

import graft.sources.xvec.XvecIO
import org.apache.spark.sql.functions._

/** Smoke coverage for every Main subcommand (X2): each dispatches onto the
  * already-tested operator and returns a sane frame.
  */
class CliSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli").toString
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    XvecIO.write(vecs.toDF("ordinal", "vector"), s"$d/base.fvec")
    XvecIO.write(vecs.take(10).toDF("ordinal", "vector"), s"$d/query.fvec")
    Files.write(Paths.get(d, "dataset.yaml"),
      """attributes: {distance_function: COSINE}
        |profiles:
        |  default:
        |    base: base.fvec
        |    query: query.fvec
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(d, "lines.txt"), "alpha\nbeta\ngamma\n".getBytes("UTF-8"))
    d
  }

  test("describe") {
    val r = Main.run(spark, Seq("describe", "--dataset", dir, "--detailed"))
    val rows = r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(rows == Map("base_vectors" -> 100L, "query_vectors" -> 10L))
  }

  test("knn") {
    val r = Main.run(spark, Seq("knn", "--base", s"$dir/base.fvec",
      "--query", s"$dir/query.fvec", "--k", "5"))
    assert(r.count() == 50)
    assert(r.columns.toSet == Set("query_id", "neighbor_id", "rank", "dist"))
    // every strategy produces the same 50 ranked rows
    val want = r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    Seq(Seq("--strategy", "auto"), Seq("--strategy", "chunked", "--chunks", "3"),
      Seq("--strategy", "partitioned", "--q-blocks", "2", "--b-blocks", "2"))
      .foreach { extra =>
        val s = Main.run(spark, Seq("knn", "--base", s"$dir/base.fvec",
          "--query", s"$dir/query.fvec", "--k", "5") ++ extra)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
        assert(s == want, s"strategy $extra diverged")
      }
  }

  test("verify_knn: identical metrics → recall 1") {
    val r = Main.run(spark, Seq("verify_knn", "--base", s"$dir/base.fvec",
      "--query", s"$dir/query.fvec", "--k", "5", "--metric", "COSINE,COSINE"))
    assert(r.collect()(0).getDouble(0) == 1.0)
  }

  test("analyze-profile") {
    val r = Main.run(spark, Seq("analyze-profile", "--input", s"$dir/base.fvec"))
    assert(r.count() == 16)
  }

  test("generate") {
    val out = s"$dir/gen.fvec"
    val r = Main.run(spark, Seq("generate", "--count", "50", "--dim", "8",
      "--out", out))
    assert(r.collect()(0).getLong(0) == 50L)
    assert(XvecIO.read(spark, out).count() == 50)
  }

  test("slab import → analyze → export") {
    val slab = s"$dir/slab"
    val imp = Main.run(spark, Seq("slab-import", "--slab", slab, "--ns", "t",
      "--file", s"$dir/lines.txt"))
    assert(imp.collect()(0).getLong(1) == 3L)
    val an = Main.run(spark, Seq("slab-analyze", "--slab", slab))
    assert(an.count() == 1)
    Main.run(spark, Seq("slab-export", "--slab", slab, "--ns", "t",
      "--out", s"$dir/exported"))
    val lines = spark.read.text(s"$dir/exported")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(lines == Seq("alpha", "beta", "gamma"))
  }

  test("dedup and decontaminate") {
    import spark.implicits._
    val corpus = s"$dir/corpus.parquet"
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different text about something else entirely here"),
      (3L, "benchmark sentence one two three four five six seven"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(corpus)
    val bench = s"$dir/bench.parquet"
    Seq((100L, "benchmark sentence one two three four five six seven"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(bench)

    val pairs = Main.run(spark, Seq("dedup", "--input", corpus,
      "--method", "jaccard", "--threshold", "0.9"))
    assert(pairs.select("id_a", "id_b").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))

    val exact = Main.run(spark, Seq("dedup", "--input", corpus, "--method", "exact"))
    assert(exact.count() == 1)

    // minhash and simhash candidate generators find the same exact-dup pair
    val mh = Main.run(spark, Seq("dedup", "--input", corpus,
      "--method", "minhash", "--threshold", "0.9"))
    assert(mh.select("id_a", "id_b").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
    val sh = Main.run(spark, Seq("dedup", "--input", corpus, "--method", "simhash"))
    assert(sh.select("id_a", "id_b").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))

    val contam = Main.run(spark, Seq("decontaminate", "--input", corpus,
      "--benchmark", bench, "--threshold", "0.9"))
    assert(contam.select("id").collect().map(_.getLong(0)).toSet == Set(3L))

    // --bloom: same verdict through the fixed-size filter (no false negatives)
    val bloom = Main.run(spark, Seq("decontaminate", "--input", corpus,
      "--benchmark", bench, "--threshold", "0.9", "--bloom"))
    assert(bloom.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L))

    // lsh-calibrate: the exact-dup pair sits in the top bucket and detects
    // with probability 1 under every config (production xx64 hash default)
    val cal = Main.run(spark, Seq("lsh-calibrate", "--input", corpus,
      "--configs", "4x3,12x1", "--perms", "12"))
    val top = cal.filter(col("bucket") === 4).collect()
    assert(top.length == 2 && top.forall(r =>
      r.getDouble(r.fieldIndex("detected_frac")) == 1.0))

    // shard: total assignment in range; --to emits the two-policy card
    val shd = Main.run(spark, Seq("shard", "--input", corpus, "--shards", "4"))
    assert(shd.count() == 4 && shd.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
    val shCard = Main.run(spark, Seq("shard", "--input", corpus,
      "--shards", "4", "--to", "5"))
    assert(shCard.collect().map(_.getString(0)).toSet == Set("hrw", "modulo"))
    val shJump = Main.run(spark, Seq("shard", "--input", corpus,
      "--shards", "4", "--jump"))
    assert(shJump.count() == 4 &&
      shJump.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
  }

  test("compute-knn packages a reloadable ground-truth dataset") {
    val out = Files.createTempDirectory("graft-cli-gt").toString
    val summary = Main.run(spark, Seq("compute-knn", "--base", s"$dir/base.fvec",
      "--query", s"$dir/query.fvec", "--out", out, "--k", "5")).collect()
    assert(summary.map(_.getString(0)).toSet ==
      Set("base_vectors", "query_vectors", "neighbor_indices", "neighbor_distances"))
    val reloaded = graft.layout.GraftDataset.load(spark, out).profile("default")
    assert(reloaded.facet("indices").count() == 10)
    // the packaged answer key runs through describe too
    val desc = Main.run(spark, Seq("describe", "--dataset", out)).collect()
    assert(desc.nonEmpty)
  }

  test("pq-encode then pq-search") {
    val out = Files.createTempDirectory("graft-cli-pq").toString
    val enc = Main.run(spark, Seq("pq-encode", "--input", s"$dir/base.fvec",
      "--out", out, "--m", "4", "--ksub", "8")).collect()
    assert(enc.head.getAs[Long]("encoded") == 100L)
    val hits = Main.run(spark, Seq("pq-search", "--index", out,
      "--query", s"$dir/query.fvec", "--k", "3")).collect()
    assert(hits.length == 30) // 10 queries x k=3
    assert(hits.forall(_.getAs[Double]("adc_dist") >= 0.0))
    // chunked query split and auto sizing return the identical result set
    val want = hits.map(x => (x.getAs[Long]("query_id"),
      x.getAs[Long]("neighbor_id"), x.getAs[Long]("rank"))).toSet
    Seq(Seq("--chunks", "3"), Seq("--strategy", "auto")).foreach { extra =>
      val s = Main.run(spark, Seq("pq-search", "--index", out,
        "--query", s"$dir/query.fvec", "--k", "3") ++ extra)
        .collect().map(x => (x.getAs[Long]("query_id"),
          x.getAs[Long]("neighbor_id"), x.getAs[Long]("rank"))).toSet
      assert(s == want, s"pq-search $extra diverged")
    }
  }

  test("asof joins latest right state at-or-before each left row") {
    import spark.implicits._
    val left = s"$dir/asof-left.parquet"
    val right = s"$dir/asof-right.parquet"
    Seq(("u1", 100L), ("u1", 205L), ("u2", 50L))
      .toDF("user", "t").write.mode("overwrite").parquet(left)
    Seq(("u1", 100L, 1L, "a"), ("u1", 200L, 2L, "b"), ("u2", 60L, 3L, "c"))
      .toDF("user", "t", "rid", "state").write.mode("overwrite").parquet(right)
    val r = Main.run(spark, Seq("asof", "--left", left, "--right", right,
      "--key", "user", "--time", "t", "--tie", "rid", "--payload", "state"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSet
    // boundary (<=) match at t=100; u2@50 precedes every right row -> null
    assert(r == Set(("u1", 100L, "a"), ("u1", 205L, "b"), ("u2", 50L, null)))
  }

  test("sample and split assign deterministic fates from the key hash") {
    import spark.implicits._
    val input = s"$dir/sample-in.parquet"
    (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang").write.mode("overwrite").parquet(input)
    val kept = Main.run(spark, Seq("sample", "--input", input,
      "--strata-col", "lang", "--key-col", "doc_id",
      "--fractions", "en=0.5,zh=1.0"))
    val langs = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs("zh") == 200L) // fraction 1.0 keeps every zh row
    assert(langs("en") > 50L && langs("en") < 150L) // ~0.5 of 200
    // re-run returns the identical keep set
    val again = Main.run(spark, Seq("sample", "--input", input,
      "--strata-col", "lang", "--key-col", "doc_id",
      "--fractions", "en=0.5,zh=1.0"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)

    // --weight-col: E-S weighted draw, deterministic size-n winner set
    val winput = s"$dir/wsample-in.parquet"
    (0L until 100L).map(i => (i, (i % 5) + 1.0)).toDF("doc_id", "w")
      .write.mode("overwrite").parquet(winput)
    val ws = Main.run(spark, Seq("sample", "--input", winput,
      "--key-col", "doc_id", "--weight-col", "w", "--n", "10"))
    assert(ws.count() == 10)
    val ws2 = Main.run(spark, Seq("sample", "--input", winput,
      "--key-col", "doc_id", "--weight-col", "w", "--n", "10"))
    assert(ws.select("doc_id").collect().map(_.getLong(0)).toSet ==
      ws2.select("doc_id").collect().map(_.getLong(0)).toSet)

    val split = Main.run(spark, Seq("split", "--input", input,
      "--key-col", "doc_id", "--splits", "train=0.8,val=0.1,test=0.1"))
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 400L)
    assert(byLabel("train") > 280L) // ~320 expected
  }

  test("chunk, quality and redact drive the text-pipeline operators") {
    import spark.implicits._
    val input = s"$dir/textops.parquet"
    val prose = ((0 until 60).map(i => s"word$i") ++ Seq("the", "and", "of")).mkString(" ")
    Seq((1L, prose + " mail me at a.b@example.org now"), (2L, "tiny"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(input)

    val chunks = Main.run(spark, Seq("chunk", "--input", input,
      "--max-tokens", "32", "--overlap", "8")).collect()
    assert(chunks.count(_.getLong(0) == 1L) == 3) // 68 toks @ stride 24
    assert(chunks.count(_.getLong(0) == 2L) == 1)

    val q = Main.run(spark, Seq("quality", "--input", input)).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("passes")).toMap
    assert(q(1L) && !q(2L))

    val red = Main.run(spark, Seq("redact", "--input", input)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L).contains("<EMAIL>") && !red(1L).contains("example.org"))
    assert(red(2L) == "tiny")

    // blocklist: tag rows only for matched terms; --gate rolls up with the
    // verdict and keeps zero-hit docs
    val tags = Main.run(spark, Seq("blocklist", "--input", input,
      "--terms", "the,tiny")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tags == Set((1L, "the", 1L), (2L, "tiny", 1L)))
    val gate = Main.run(spark, Seq("blocklist", "--input", input,
      "--terms", "the,tiny", "--gate", "1")).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("blocked")).toMap
    assert(gate == Map(1L -> true, 2L -> true))
  }

  test("pack, dupspans, bm25 and mix drive the curation operators") {
    import spark.implicits._
    val input = s"$dir/packops.parquet"
    Seq((1L, "a b c d e f g h", "web"), (2L, "a b c d e f g h", "web"),
        (3L, "p q r s", "books"), (4L, "", "books"))
      .toDF("doc_id", "text", "domain").write.mode("overwrite").parquet(input)

    val coords = Main.run(spark, Seq("pack", "--input", input, "--seq-len", "8"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(coords == Map(1L -> 0L, 2L -> 8L, 3L -> 16L)) // empty doc dropped
    val manifest = Main.run(spark, Seq("pack", "--input", input,
      "--seq-len", "8", "--manifest"))
    assert(manifest.count() == 3)
    val seqs = Main.run(spark, Seq("pack", "--input", input,
      "--seq-len", "8", "--sequences")).collect()
    assert(seqs.length == 3 && seqs.forall(_.getLong(1) <= 8))
    // --batches: docs atomic, length-ordered, budget respected per batch
    val batches = Main.run(spark, Seq("pack", "--input", input,
      "--seq-len", "8", "--batches"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(batches == Map(3L -> 0L, 1L -> 0L, 2L -> 1L)) // 4, then 8s split
    // --whole: no-truncation bins within --group-col shards; the 8-token
    // web docs each fill one bin, books' 4-token doc sits alone
    val whole = Main.run(spark, Seq("pack", "--input", input,
      "--seq-len", "8", "--whole", "--group-col", "domain"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(whole == Set(("web", 1L, 0L), ("web", 2L, 1L), ("books", 3L, 0L)))
    val wReport = Main.run(spark, Seq("pack", "--input", input,
      "--seq-len", "8", "--whole", "--group-col", "domain", "--report"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(wReport == Map("web" -> 2L, "books" -> 1L))

    val spans = Main.run(spark, Seq("dupspans", "--input", input, "--width", "4"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(spans(1L) == 1.0 && spans(2L) == 1.0 && spans(3L) == 0.0)
    // --remove: the duplicated docs lose everything, unique docs survive
    val removed = Main.run(spark, Seq("dupspans", "--input", input,
      "--width", "4", "--remove"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(removed(1L) == "" && removed(2L) == "")
    assert(removed(3L) == "p q r s" && removed(4L) == "")

    val hits = Main.run(spark, Seq("bm25", "--input", input,
      "--terms", "p,q", "--k", "2")).collect()
    assert(hits.length == 1 && hits(0).getLong(0) == 3L)
    // terms are trimmed: "p, q" must match the same docs, not silently
    // search for the unmatched term " q"
    val spaced = Main.run(spark, Seq("bm25", "--input", input,
      "--terms", "p, q", "--k", "2")).collect()
    assert(spaced.map(_.getLong(0)).toSeq == hits.map(_.getLong(0)).toSeq)
    val err = intercept[IllegalArgumentException](Main.run(spark,
      Seq("bm25", "--input", input, "--terms", " , ", "--k", "2")))
    assert(err.getMessage.contains("non-empty term"))
    // --ranker ql: the Dirichlet ranker finds the same lone candidate doc
    val ql = Main.run(spark, Seq("bm25", "--input", input,
      "--terms", "p,q", "--k", "2", "--ranker", "ql", "--mu", "10")).collect()
    assert(ql.length == 1 && ql(0).getLong(0) == 3L)

    val mixed = Main.run(spark, Seq("mix", "--input", input, "--domain-col",
      "domain", "--key-col", "doc_id", "--factors", "web=2.0,books=1.0"))
    assert(mixed.collect().count(_.getString(2) == "web") == 4)
  }

  test("mix --balance solves uniform-rebalance factors from a weight column") {
    import spark.implicits._
    val input = s"$dir/mixbal.parquet"
    // a: 1 row x 30 tokens, b: 3 rows x 10 tokens -> equal mass already:
    // factors T/(2*30)=1.0 each -> every row exactly once
    (Seq((1L, "a", 30L)) ++ (2L to 4L).map(i => (i, "b", 10L)))
      .toDF("doc_id", "domain", "n_tokens")
      .write.mode("overwrite").parquet(input)
    val out = Main.run(spark, Seq("mix", "--input", input, "--domain-col",
      "domain", "--key-col", "doc_id", "--balance"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("mix --temperature lifts the tail domain without flattening the head") {
    import spark.implicits._
    val input = s"$dir/mixtemp.parquet"
    // a: 1 row x 100 tokens, b: 4 rows x 100 tokens -> T_a=100, T_b=400;
    // α=0.5 factors: a 1.666667 (1 whole epoch + draw), b 0.833333
    ((1L to 1L).map(i => (i, "a", 100L)) ++ (2L to 5L).map(i => (i, "b", 100L)))
      .toDF("doc_id", "domain", "n_tokens")
      .write.mode("overwrite").parquet(input)
    val out = Main.run(spark, Seq("mix", "--input", input, "--domain-col",
      "domain", "--key-col", "doc_id", "--temperature", "0.5"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // every a-row appears at least once (factor > 1); b-rows at most once
    assert(out.count(_._1 == 1L) >= 1)
    assert(out.filter(_._1 >= 2L).groupBy(_._1).forall(_._2.length == 1))
  }

  test("surprisal and semdecontaminate drive the corpus-relative scores") {
    import spark.implicits._
    val tIn = s"$dir/surprisal.parquet"
    Seq((1L, "x x x x"), (2L, "x y")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(tIn)
    val sp = Main.run(spark, Seq("surprisal", "--input", tIn))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // p(x)=5/6, p(y)=1/6: doc 1 scores -ln(5/6), doc 2 the mean of both
    assert(sp(1L) < sp(2L))
    // --bigram scores transitions: (x,x)=3 of c(x·)=4, (x,y)=1
    val bsp = Main.run(spark, Seq("surprisal", "--input", tIn, "--bigram"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bsp(1L) < bsp(2L)) // x->x is the likely transition
    assert(bsp.size == 2)
    // --kn: interpolated Kneser-Ney keeps the quality ordering (on this
    // single-context fixture KN's discounted+continuation mass happens to
    // recompose the MLE values exactly — CurationOpsSpec covers the
    // multi-context case where they differ)
    val ksp = Main.run(spark, Seq("surprisal", "--input", tIn, "--kn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ksp(1L) < ksp(2L) && ksp.size == 2)

    val eIn = s"$dir/semdecon-corpus.parquet"
    val bIn = s"$dir/semdecon-bench.parquet"
    Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(bIn)
    Seq((5L, Array(1f, 0f)), (6L, Array(0f, 1f))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(eIn)
    val sc = Main.run(spark, Seq("semdecontaminate", "--input", eIn,
      "--benchmark", bIn)).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc == Map(5L -> 1.0, 6L -> 0.0))
    // a chunked bench yields the identical scores
    val scChunked = Main.run(spark, Seq("semdecontaminate", "--input", eIn,
      "--benchmark", bIn, "--bench-chunks", "2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scChunked == sc)
  }

  test("normalize composes decomposed sequences to NFC") {
    import spark.implicits._
    val input = s"$dir/nfc.parquet"
    Seq((1L, "caf\u00e9"), (2L, "cafe\u0301"), (3L, "plain"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("normalize", "--input", input))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == r(2L))            // precomposed == composed(decomposed)
    assert(r(2L) == "caf\u00e9")      // NFC form
    assert(r(3L) == "plain")          // ASCII unchanged
  }

  test("pca projects, covaries and standardizes") {
    import spark.implicits._
    val input = s"$dir/pca.parquet"
    val rnd3 = new scala.util.Random(17)
    (0L until 50L).map(i => (i, Array.fill(4)(rnd3.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(input)
    val proj = Main.run(spark, Seq("pca", "--input", input, "--k", "2"))
    assert(proj.count() == 50)
    assert(proj.select("proj").head.getSeq[Double](0).length == 2)
    val cov = Main.run(spark, Seq("pca", "--input", input, "--covariance"))
    assert(cov.count() == 16)
    val std = Main.run(spark, Seq("pca", "--input", input, "--standardize"))
    assert(std.count() == 200)
  }

  test("bpe trains merges and encodes piece counts") {
    import spark.implicits._
    val input = s"$dir/bpe.parquet"
    Seq((1L, "ab ab ab"), (2L, "abc abc")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val merges = Main.run(spark, Seq("bpe", "--input", input, "--merges", "2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1L, "a", "b", 5L), (2L, "ab", "c", 2L)))
    val enc = Main.run(spark, Seq("bpe", "--input", input, "--merges", "2",
      "--encode")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc == Map(1L -> 3L, 2L -> 2L)) // "ab"=1 piece, "abc"=1 piece
    // --ids: token-id sequences from the trained model. Vocab in UTF-8
    // order: a=0, ab=1, abc=2, b=3, c=4
    val ids = Main.run(spark, Seq("bpe", "--input", input, "--merges", "2",
      "--ids")).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(ids == Map(1L -> Seq(1, 1, 1), 2L -> Seq(2, 2)))
    // --decode: round trip back to the space-stripped corpus
    val dec = Main.run(spark, Seq("bpe", "--input", input, "--merges", "2",
      "--decode")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == Map(1L -> "ababab", 2L -> "abcabc"))
    // merge-count ceiling: a driver loop per merge, refuse past --max-merges
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, Seq("bpe", "--input", input, "--merges", "60000"))
    }
    assert(e.getMessage.contains("max-merges"))
    assert(Main.run(spark, Seq("bpe", "--input", input, "--merges", "3",
      "--max-merges", "3")).count() >= 1)
  }

  test("bpe --bytes: byte-level merges and the exact decode round trip") {
    import spark.implicits._
    val input = s"$dir/bpe_bytes.parquet"
    val texts = Seq((1L, "Mixed CASE text"), (2L, "多字节 bytes 多字节"))
    texts.toDF("doc_id", "text").write.mode("overwrite").parquet(input)
    val merges = Main.run(spark,
      Seq("bpe", "--input", input, "--bytes", "--merges", "4"))
    assert(merges.count() == 4L)
    // byte-level round trip is EXACT (case, spaces, multi-byte)
    val dec = Main.run(spark, Seq("bpe", "--input", input, "--bytes",
      "--merges", "4", "--decode"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == texts.toMap)
    val ids = Main.run(spark, Seq("bpe", "--input", input, "--bytes",
      "--merges", "0", "--ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // 0 merges -> one id per UTF-8 byte; zh chars are 3 bytes each
    assert(ids(1L).size == texts(0)._2.getBytes("UTF-8").length)
    assert(ids(2L).size == texts(1)._2.getBytes("UTF-8").length)
  }

  test("cluster assigns k-means cells and balanced samples") {
    import spark.implicits._
    val input = s"$dir/cluster.parquet"
    val rnd2 = new scala.util.Random(3)
    (0L until 40L).map { i =>
      val c = if (i % 2 == 0) 0f else 8f
      (i, Array(c + rnd2.nextGaussian().toFloat * 0.3f, c))
    }.toDF("vec_id", "embedding").write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("cluster", "--input", input, "--k", "2",
      "--iters", "4")).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 40)
    // two blobs separate perfectly: even ids together, odd ids together
    assert(r.filter(_._1 % 2 == 0).values.toSet.size == 1)
    assert(r.filter(_._1 % 2 == 1).values.toSet.size == 1)
    val sampled = Main.run(spark, Seq("cluster", "--input", input, "--k", "2",
      "--iters", "4", "--per-cell", "5"))
    assert(sampled.count() == 10)
    // --drop-proto: D4 prune drops ceil(0.25 * 20) = 5 per cell
    val kept = Main.run(spark, Seq("cluster", "--input", input, "--k", "2",
      "--iters", "4", "--drop-proto", "0.25"))
    assert(kept.count() == 30)
  }

  test("buckets assigns surprisal quantiles 1..k") {
    import spark.implicits._
    val input = s"$dir/buckets.parquet"
    (1L to 8L).map(i => (i, ("w" + i + " ") * i.toInt)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("buckets", "--input", input, "--k", "4"))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r.size == 8)
    assert(r.values.toSet == Set(1L, 2L, 3L, 4L)) // 8 docs / 4 buckets, 2 each
    assert(r.values.groupBy(identity).values.forall(_.size == 2))
    // --thresholds: the k-1 value cut points, ascending
    val t = Main.run(spark, Seq("buckets", "--input", input, "--k", "4",
      "--thresholds")).orderBy("bucket").collect()
    assert(t.length == 3 && t.map(_.getDouble(1)).toSeq.sorted ==
      t.map(_.getDouble(1)).toSeq)
    val ta = Main.run(spark, Seq("buckets", "--input", input, "--k", "4",
      "--thresholds", "--approx")).collect()
    assert(ta.length == 3)
  }

  test("vocab returns the exact top-k token counts") {
    import spark.implicits._
    val input = s"$dir/vocab.parquet"
    Seq((1L, "a a a b b c"), (2L, "b a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("vocab", "--input", input, "--k", "2"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 4L), ("b", 3L)))
    val mc = Main.run(spark, Seq("vocab", "--input", input, "--min-count", "3"))
      .collect().map(_.getString(0)).toSet
    assert(mc == Set("a", "b"))
  }

  test("tfidf and hashtf drive the vectorization operators") {
    import spark.implicits._
    val input = s"$dir/tfidf.parquet"
    Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val tfidf = Main.run(spark, Seq("tfidf", "--input", input, "--min-df", "2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(tfidf.map(_._2).toSet == Set("a")) // df pruning applied
    assert(tfidf.toSet == Set((1L, "a", 2L), (2L, "a", 1L)))
    val hashed = Main.run(spark, Seq("hashtf", "--input", input,
      "--n-buckets", "32")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(hashed == Map(1L -> 3L, 2L -> 2L)) // token mass conserved
  }

  test("cms surfaces heavy hitters with exact counts on a wide grid") {
    import spark.implicits._
    val input = s"$dir/cms.parquet"
    Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("cms", "--input", input,
      "--depth", "4", "--width", "65536", "--threshold", "2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 2L)) // collision-free => exact
  }

  test("mg-heavy surfaces the guaranteed-heavy tokens with exact counts") {
    import spark.implicits._
    val input = s"$dir/mg.parquet"
    Seq((1L, "a a a a b"), (2L, "a b c d")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    // n=9, k=3 => threshold 2.25: only 'a' (5) and nothing else qualifies
    val got = Main.run(spark, Seq("mg-heavy", "--input", input, "--k", "3"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 5L))
  }

  test("slab-delete then slab-compact reclaims dead rows via the CLI") {
    import spark.implicits._
    val slabDir = s"$dir/slab-cli-gc"
    val slab = new graft.sources.slab.SlabTable(spark, slabDir)
    slab.append("ns", (0L until 10L).map(i => (i, s"r$i".getBytes))
      .toDF("ordinal", "data"))
    val afterDel = Main.run(spark, Seq("slab-delete", "--slab", slabDir,
      "--ns", "ns", "--ordinals", "3,9")).collect()(0)
    assert(afterDel.getLong(1) == 8L) // live records
    val afterGc = Main.run(spark, Seq("slab-compact", "--slab", slabDir,
      "--ns", "ns")).collect()(0)
    assert(afterGc.getLong(1) == 8L)
    assert(slab.deadCount("ns") == 0L && slab.maxOrdinal("ns") == 9L)
  }

  test("rrf fuses two ranking parquets via the CLI") {
    import spark.implicits._
    val aP = s"$dir/rrf_a.parquet"; val bP = s"$dir/rrf_b.parquet"
    Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "neighbor_id", "rank")
      .write.mode("overwrite").parquet(aP)
    Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "neighbor_id", "rank")
      .write.mode("overwrite").parquet(bP)
    val got = Main.run(spark, Seq("rrf", "--inputs", s"$aP,$bP", "--k", "1"))
      .collect()(0)
    assert(got.getLong(1) == 11L) // in both lists, wins the fusion
  }

  test("release: --incremental equals the from-scratch run on the new corpus") {
    import spark.implicits._
    val mk = (i: Long) => s"document number $i with shared words " +
      (if (i % 6 == 0) "duplicate body duplicate body duplicate body common run"
       else s"unique tail $i ${"x" * (i % 9).toInt} content piece $i")
    val v2 = (0L until 80L).map(i => (i, mk(i))).toDF("doc_id", "text")
    val v1 = v2.filter(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 2,
        concat(lit("OLD "), col("text"))).otherwise(col("text")))
    val bench = v2.filter(col("doc_id") % 20 === 0)
    val (vp1, vp2, bp) = (s"$dir/rel-v1.parquet", s"$dir/rel-v2.parquet", s"$dir/rel-b.parquet")
    v1.write.mode("overwrite").parquet(vp1)
    v2.write.mode("overwrite").parquet(vp2)
    bench.write.mode("overwrite").parquet(bp)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val scratch = rows(Main.run(spark, Seq("release", "--new", vp2,
      "--bench", bp, "--budget", "400")))
    val incr = rows(Main.run(spark, Seq("release", "--new", vp2, "--bench", bp,
      "--incremental", "--old", vp1, "--budget", "400")))
    assert(scratch.nonEmpty && incr == scratch)

    // --takedown prunes artifacts and equals from-scratch on the reduced
    // corpus; --takedown-audit's leftover column is all-zero
    val rmP = s"$dir/rel-rm.parquet"
    v2.filter(col("doc_id") % 10 === 0).select("doc_id")
      .write.mode("overwrite").parquet(rmP)
    val swept = rows(Main.run(spark, Seq("release", "--new", vp2,
      "--bench", bp, "--budget", "400", "--takedown", rmP)))
    val reducedP = s"$dir/rel-v2r.parquet"
    v2.filter(col("doc_id") % 10 =!= 0).write.mode("overwrite").parquet(reducedP)
    val reduced = rows(Main.run(spark, Seq("release", "--new", reducedP,
      "--bench", bp, "--budget", "400")))
    assert(swept == reduced)
    val audit = Main.run(spark, Seq("release", "--new", vp2, "--bench", bp,
      "--budget", "400", "--takedown", rmP, "--takedown-audit")).collect()
    assert(audit.length == 5 && audit.forall(_.getLong(2) == 0L))

    // --index-out ships the selection's serving index as a self-contained
    // BUNDLE: cell-partitioned rows + the frozen quantizer
    val idxOut = s"$dir/rel-index"
    val sel2 = Main.run(spark, Seq("release", "--new", vp2, "--bench", bp,
      "--budget", "400", "--index-out", idxOut))
    val selIds = sel2.select("id").collect().map(_.getLong(0)).toSet
    val idx = spark.read.parquet(s"$idxOut/cells")
    assert(idx.columns.contains("cell"))
    assert(idx.select("id").collect().map(_.getLong(0)).toSet == selIds)
    assert(spark.read.parquet(s"$idxOut/quantizer").count() > 0)

    // lifecycle: the bundle serves queries with NOTHING but its path —
    // hash-embed two selected docs and search; every neighbor is a
    // selected doc and each query finds itself at rank 1
    val qIds = selIds.toSeq.sorted.take(2)
    val qVecs = graft.operators.TfIdf.hashedEmbedding(
        spark.read.parquet(vp2).filter(col("doc_id").isInCollection(qIds)),
        "doc_id", "text", dim = 16)
      .select(col("doc_id").as("vec_id"),
        col("hvec").cast("array<float>").as("embedding"))
    val qPath2 = s"$dir/rel-qvecs.parquet"
    qVecs.write.mode("overwrite").parquet(qPath2)
    val served = Main.run(spark, Seq("ivf-search", "--index", idxOut,
      "--query", qPath2, "--k", "3", "--n-probe", "8"))
    val byQ = served.collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, _, nid) => assert(selIds.contains(nid)) }
    qIds.foreach { q =>
      assert(byQ.contains((q, 1, q)), s"query $q should find itself at rank 1")
    }
  }

  test("hybrid-ann: filtered search respects the predicate; --probes yields the card") {
    import spark.implicits._
    val input = s"$dir/hybrid.parquet"
    val rnd = new scala.util.Random(11)
    (0L until 120L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(input)
    val qPath = s"$dir/hybrid-q.parquet"
    spark.read.parquet(input).filter(col("vec_id") >= 110)
      .write.mode("overwrite").parquet(qPath)
    val got = Main.run(spark, Seq("hybrid-ann", "--base", input,
      "--query", qPath, "--meta", "label",
      "--predicate", """{"field":"label","op":"GE","values":[2]}""",
      "--k", "3", "--n-list", "8", "--n-probe", "8", "--exclude-self"))
    val rows = got.join(spark.read.parquet(input)
        .select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .select("label").collect().map(_.getLong(0))
    assert(rows.nonEmpty && rows.forall(_ >= 2L))

    val card = Main.run(spark, Seq("hybrid-ann", "--base", input,
      "--query", qPath, "--meta", "label",
      "--predicate", """{"field":"label","op":"GE","values":[2]}""",
      "--k", "3", "--n-list", "8", "--probes", "2,8", "--exclude-self"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(card.keySet == Set(2L, 8L))
    assert(card(8L) == 1.0, s"exhaustive probe must hit recall 1.0: $card")
    assert(card(2L) <= card(8L))

    // routed: label GE 3 keeps 1/4 of 120 rows (est 30); --exact-max 40
    // routes everything exact, so results ARE the filtered truth and the
    // card's single row reads recall 1.0
    val routed = Main.run(spark, Seq("hybrid-ann", "--base", input,
      "--query", qPath, "--meta", "label",
      "--predicate", """{"field":"label","op":"GE","values":[3]}""",
      "--k", "3", "--n-list", "8", "--n-probe", "2", "--routed",
      "--exact-max", "40", "--exclude-self"))
    assert(routed.select("route").distinct().collect()
      .map(_.getString(0)).toSet == Set("exact"))
    val rCard = Main.run(spark, Seq("hybrid-ann", "--base", input,
      "--query", qPath, "--meta", "label",
      "--predicate", """{"field":"label","op":"GE","values":[3]}""",
      "--k", "3", "--n-list", "8", "--n-probe", "2", "--routed",
      "--exact-max", "40", "--routed-card", "--exclude-self")).collect()
    assert(rCard.length == 1 && rCard.head.getString(0) == "exact")
    assert(rCard.head.getDouble(rCard.head.fieldIndex("recall")) == 1.0)
  }

  test("hybrid-ann --guaranteed fills short lists; ivf-maintain appends/deletes; ivf-staleness emits both configs") {
    import spark.implicits._
    val input = s"$dir/hybrid.parquet" // written by the hybrid-ann test data
    val rnd = new scala.util.Random(11)
    (0L until 120L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(input)
    val qPath = s"$dir/hybrid-q.parquet"
    spark.read.parquet(input).filter(col("vec_id") >= 110)
      .write.mode("overwrite").parquet(qPath)

    // guaranteed: label>=3 keeps 1/4 of the corpus; nProbe=1 starves some
    // queries and every list must still reach k=5
    val got = Main.run(spark, Seq("hybrid-ann", "--base", input,
      "--query", qPath, "--meta", "label",
      "--predicate", """{"field":"label","op":"GE","values":[3]}""",
      "--k", "5", "--n-list", "8", "--n-probe", "1", "--guaranteed",
      "--exclude-self"))
    val perQ = got.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQ.length == 10 && perQ.forall(_ == 5L))
    assert(got.columns.contains("escalated"))

    // adaptive: stats-planned widths — same predicate, every neighbor
    // still satisfies it
    val adp = Main.run(spark, Seq("hybrid-ann", "--base", input,
      "--query", qPath, "--meta", "label",
      "--predicate", """{"field":"label","op":"GE","values":[3]}""",
      "--k", "5", "--n-list", "8", "--n-probe", "8", "--adaptive",
      "--exclude-self"))
      .join(spark.read.parquet(input)
        .select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
    val adpLabs = adp.select("label").collect().map(_.getLong(0))
    assert(adpLabs.nonEmpty && adpLabs.forall(_ >= 3L))

    // maintain: base rows 0..99, add 100..119, delete multiples of 10 —
    // occupancy totals must reflect exactly the surviving 108 ids
    val basePath = s"$dir/maint-base.parquet"
    val addPath = s"$dir/maint-add.parquet"
    val delPath = s"$dir/maint-del.parquet"
    spark.read.parquet(input).filter(col("vec_id") < 100)
      .write.mode("overwrite").parquet(basePath)
    spark.read.parquet(input).filter(col("vec_id") >= 100)
      .write.mode("overwrite").parquet(addPath)
    spark.read.parquet(input).filter(col("vec_id") % 10 === 0)
      .write.mode("overwrite").parquet(delPath)
    val idx = Main.run(spark, Seq("ivf-maintain", "--base", basePath,
      "--add", addPath, "--delete", delPath, "--meta", "label"))
    assert(idx.count() == 108)
    val occ = Main.run(spark, Seq("ivf-maintain", "--base", basePath,
      "--add", addPath, "--delete", delPath, "--occupancy"))
    assert(occ.agg(sum("n")).collect().head.getLong(0) == 108L)

    // filtered serving from a bundle via the CLI: every neighbor satisfies
    // the predicate; --guaranteed fills lists at a starving probe width
    val bundlePath = s"$dir/cli-bundle"
    val bIdx = graft.operators.Ann.ivfIndexWithMeta(
      spark.read.parquet(input),
      spark.read.parquet(input).filter(col("vec_id") < 8),
      metaCols = Seq("label"))
    graft.operators.Ann.writeIndexBundle(bIdx,
      spark.read.parquet(input).filter(col("vec_id") < 8), bundlePath)
    val fServe = Main.run(spark, Seq("ivf-search", "--index", bundlePath,
      "--query", qPath, "--meta", "label", "--metric", "COSINE",
      "--predicate", """{"field":"label","op":"GE","values":[3]}""",
      "--k", "5", "--n-probe", "1", "--guaranteed", "--exclude-self"))
    val fRows = fServe.join(spark.read.parquet(input)
        .select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
    assert(fRows.select("label").collect().map(_.getLong(0)).forall(_ >= 3L))
    val fPerQ = fServe.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(fPerQ.length == 10 && fPerQ.forall(_ == 5L))

    // staleness: two configs, sane measurements
    val card = Main.run(spark, Seq("ivf-staleness", "--old", basePath,
      "--new", input, "--queries", qPath, "--cells", "4", "--k", "3",
      "--n-probe", "2", "--exclude-self"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(card.keySet == Set("stale", "retrained"))
    assert(card.values.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("rankeval computes MRR/nDCG from ranked + truth parquets") {
    import spark.implicits._
    val rp = s"$dir/rank.parquet"; val tp = s"$dir/rank-truth.parquet"
    Seq((1L, 10L, 1), (1L, 99L, 2), (2L, 98L, 1), (2L, 20L, 2))
      .toDF("query_id", "neighbor_id", "rank").write.mode("overwrite").parquet(rp)
    Seq((1L, 10L), (2L, 20L)).toDF("query_id", "neighbor_id")
      .write.mode("overwrite").parquet(tp)
    val row = Main.run(spark, Seq("rankeval", "--ranked", rp, "--truth", tp,
      "--k", "2")).collect()(0)
    assert(row.getLong(0) == 2)
    assert(row.getDouble(1) == 0.75) // (1/1 + 1/2) / 2
  }

  test("binary-topk ranks by XOR-popcount via the CLI") {
    import spark.implicits._
    val input = s"$dir/bin.parquet"
    Seq((0L, Array(1f, 1f, 1f, 1f)), (1L, Array(1f, 1f, 1f, -1f)),
        (2L, Array(-1f, -1f, -1f, -1f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("binary-topk", "--input", input,
      "--queries", "1", "--k", "2"))
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 4L))) // hamming 1 then 4
  }

  test("hashembed emits a deterministic model-free doc vector via the CLI") {
    import spark.implicits._
    val input = s"$dir/hembed.parquet"
    Seq((1L, "x x"), (2L, "x x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("hashembed", "--input", input, "--dim", "4"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == got(2L)) // identical text -> identical vector
    assert(got(1L).forall(v => math.abs(v) == 2L))
  }

  test("viterbi --em re-estimates the unigram inventory via the CLI") {
    import spark.implicits._
    val input = s"$dir/em.parquet"
    Seq((1L, "abab abab"), (2L, "abab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("viterbi", "--input", input, "--em"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 6L))
  }

  test("datasheet emits the one-row corpus card via the CLI") {
    import spark.implicits._
    val input = s"$dir/datasheet.parquet"
    Seq((1L, "a b", "en"), (2L, "a b", "en"), (3L, "c", "de"))
      .toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("datasheet", "--input", input)).collect()(0)
    // 3 docs, 5 tokens, 3 types, 2 langs, 2 exact-dup docs
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 5L, 3L, 2L, 2L)))
  }

  test("heaps fits the all-new-tokens corpus at beta=1 via the CLI") {
    import spark.implicits._
    val input = s"$dir/heaps.parquet"
    (0L until 20L).map(i => (i, s"x${i}a x${i}b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("heaps", "--input", input)).collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.0)
  }

  test("wordpiece segments distinct words with ## continuations via the CLI") {
    import spark.implicits._
    val input = s"$dir/wp.parquet"
    Seq((1L, "abx aby"), (2L, "zab wab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("wordpiece", "--input", input))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // 'ab' reaches minCount=2 as an initial (abx, aby) AND as a
    // continuation (zab, wab); everything else stays characters
    assert(got == Set(
      ("abx", 0, "ab"), ("abx", 1, "##x"),
      ("aby", 0, "ab"), ("aby", 1, "##y"),
      ("zab", 0, "z"), ("zab", 1, "##ab"),
      ("wab", 0, "w"), ("wab", 1, "##ab")))
  }

  test("budget-select keeps the fitting density prefix via the CLI") {
    import spark.implicits._
    val input = s"$dir/budget.parquet"
    Seq((1L, 30.0, 10L), (2L, 40.0, 20L), (3L, 30.0, 30L))
      .toDF("doc_id", "score", "cost").write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("budget-select", "--input", input,
      "--score-col", "score", "--cost-col", "cost", "--budget", "30"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == Set(1L, 2L))
  }

  test("snapdiff --card totals the four statuses via the CLI") {
    import spark.implicits._
    val oldP = s"$dir/snap_old.parquet"; val newP = s"$dir/snap_new.parquet"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(oldP)
    Seq((1L, "a"), (2L, "b2"), (3L, "c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(newP)
    val got = Main.run(spark, Seq("snapdiff", "--old", oldP, "--new", newP,
      "--card")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "removed" -> 0L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("kcenter picks the farthest point after the low-id seed via the CLI") {
    import spark.implicits._
    val input = s"$dir/kcenter.parquet"
    Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(10f, 0f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("kcenter", "--input", input, "--k", "2"))
      .orderBy("rank").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("mmr defers the redundant near-duplicate via the CLI") {
    import spark.implicits._
    val input = s"$dir/mmr.parquet"
    Seq((1L, 1L, 0.90, Array(1f, 0f)), (1L, 2L, 0.89, Array(1f, 0f)),
        (1L, 3L, 0.50, Array(0f, 1f)))
      .toDF("query_id", "doc_id", "rel", "embedding")
      .write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("mmr", "--input", input,
      "--lambda", "0.5", "--k", "2"))
      .orderBy("rank").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("doremi reweights domains by excess loss via the CLI") {
    import spark.implicits._
    val input = s"$dir/doremi.parquet"
    Seq(("a", 2.0, 1.0), ("b", 1.0, 2.0)).toDF("d", "loss", "ref")
      .write.mode("overwrite").parquet(input)
    val got = Main.run(spark, Seq("doremi", "--input", input,
      "--domain-col", "d", "--loss-col", "loss", "--ref-col", "ref",
      "--eta", s"${math.log(3.0)}", "--smoothing", "0.2", "--steps", "1"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 0.7, "b" -> 0.3))
  }

  test("curriculum, winsorize, ensemble, keepbest and pack --report drive the curation operators") {
    import spark.implicits._
    val input = s"$dir/cur.parquet"
    (1L to 20L).map(i => (i, s"tok$i word common text here now", i.toDouble))
      .toDF("doc_id", "text", "score")
      .write.mode("overwrite").parquet(input)

    val cur = Main.run(spark, Seq("curriculum", "--input", input,
      "--difficulty-col", "score", "--k", "2")).collect()
    assert(cur.length == 20)
    val stages = cur.map(r => r.getAs[Long]("stage")).toSet
    assert(stages == Set(1L, 2L))

    val win = Main.run(spark, Seq("winsorize", "--input", input,
      "--value-col", "score", "--c", "1.0")).collect()
      .map(_.getAs[Double]("winsorized"))
    // median 10.5, MAD 5 -> fence [5.5, 15.5]
    assert(win.min == 5.5 && win.max == 15.5)

    val ens = Main.run(spark, Seq("ensemble", "--input", input,
      "--signals", "score")).collect()
    assert(ens.map(_.getAs[Double]("quality_ensemble")).max == 1.0)

    val kb = Main.run(spark, Seq("keepbest", "--input", input,
      "--score-col", "score")).collect()
    assert(kb.length == 20 && kb.forall(_.getAs[Boolean]("kept")))

    val rep = Main.run(spark, Seq("pack", "--input", input,
      "--seq-len", "16", "--report")).head()
    assert(rep.getAs[Long]("total_tokens") == 120L) // 6 tokens x 20 docs
    assert(rep.getAs[Long]("n_sequences") == 8L)
  }

  test("cms --score and viterbi drive the sketch-scoring and segmentation operators") {
    import spark.implicits._
    val input = s"$dir/vit.parquet"
    Seq((1L, "aa aa aa b"), (2L, "aa b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(input)
    val sc = Main.run(spark, Seq("cms", "--input", input, "--score",
      "--depth", "3", "--width", "4096", "--threshold", "4")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // counts: aa=4, b=2, c=1 -> only aa passes threshold 4
    assert(sc == Map(1L -> 0.75, 2L -> math.rint(1.0 / 3 * 1e6) / 1e6))
    val vit = Main.run(spark, Seq("viterbi", "--input", input)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vit.keySet == Set("aa", "b", "c"))
    // "aa" segments as the single piece "aa" (score ln(4/total)) rather
    // than "a"+"a": piece counts aa=4, a=8 per occurrence... the DP just
    // must beat or equal the char-level path
    val pieces = graft.operators.UnigramSeg.pieceScores(
      spark.read.parquet(input), "text").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vit("aa") >= math.rint((pieces("a") * 2) * 1e6) / 1e6)
  }

  test("sample --group-col and gquantiles drive the grouped-rank operators") {
    import spark.implicits._
    val input = s"$dir/grp.parquet"
    (1L to 40L).map(i => (i, s"g${i % 2}", i.toDouble))
      .toDF("doc_id", "grp", "v")
      .write.mode("overwrite").parquet(input)
    val gs = Main.run(spark, Seq("sample", "--input", input,
      "--group-col", "grp", "--key-col", "doc_id", "--n", "3")).collect()
    assert(gs.length == 6) // 2 groups x 3
    val gq = Main.run(spark, Seq("gquantiles", "--input", input,
      "--group-col", "grp", "--value-col", "v", "--ps", "0.5")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // g0: evens 2..40 -> median 21; g1: odds 1..39 -> median 20
    assert(gq == Map("g0" -> 21.0, "g1" -> 20.0))
  }

  test("novelty, entropy and winsorize --group-col drive the new signals") {
    import spark.implicits._
    val input = s"$dir/nov.parquet"
    Seq((1L, "alpha beta gamma delta", "g0", 5.0),
        (2L, "alpha beta gamma delta", "g0", 6.0),
        (3L, "other words over here", "g1", 100.0))
      .toDF("doc_id", "text", "grp", "v")
      .write.mode("overwrite").parquet(input)
    val nov = Main.run(spark, Seq("novelty", "--input", input)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nov == Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
    val ent = Main.run(spark, Seq("entropy", "--input", input)).collect()
    assert(ent.length == 3 && ent.forall(_.getDouble(1) > 0.0))
    val gw = Main.run(spark, Seq("winsorize", "--input", input,
      "--value-col", "v", "--group-col", "grp")).collect()
      .map(r => r.getAs[Double]("winsorized")).toSet
    assert(gw == Set(5.0, 6.0, 100.0)) // no outliers -> identity per group
  }

  test("semdedup clusters embedding near-duplicates via the CLI") {
    import spark.implicits._
    val input = s"$dir/semdedup.parquet"
    val rnd = new scala.util.Random(11)
    val base = (0L until 20L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val dup = (100L, base.head._2.map(x => x * 0.999f))
    (base :+ dup).toDF("vec_id", "embedding").write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("semdedup", "--input", input))
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r(0L) && !r(100L) && r.size == 21)
    // recall knobs are exposed: a wider table setting finds the same dup
    val tuned = Main.run(spark, Seq("semdedup", "--input", input,
      "--n-bits", "6", "--n-tables", "12"))
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(tuned(0L) && !tuned(100L) && tuned.size == 21)
    // --cells: the k-means-sharded paper shape finds the planted dup too
    val sharded = Main.run(spark, Seq("semdedup", "--input", input,
      "--cells", "2", "--iters", "2"))
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(sharded(0L) && !sharded(100L) && sharded.size == 21)
  }

  test("logreg trains a model table and scores rows via the CLI") {
    import spark.implicits._
    val input = s"$dir/logreg.parquet"
    (0L until 100L).map(i => (i, (i % 2).toDouble, (i % 2).toDouble, 1.0 - (i % 2)))
      .toDF("doc_id", "y", "x1", "x2").write.mode("overwrite").parquet(input)
    val model = Main.run(spark, Seq("logreg", "--input", input,
      "--features", "x1,x2", "--label-col", "y", "--steps", "5"))
      .orderBy("idx").collect()
    assert(model.length == 3) // bias + 2 weights
    assert(model(1).getDouble(1) > 0 && model(2).getDouble(1) < 0)
    val scored = Main.run(spark, Seq("logreg", "--input", input,
      "--features", "x1,x2", "--label-col", "y", "--steps", "50",
      "--lr", "5.0", "--score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((0L until 100L).forall(i => (scored(i) >= 0.5) == (i % 2 == 1)))
  }

  test("hardneg mines cross-label nearest neighbors") {
    import spark.implicits._
    val input = s"$dir/hardneg.parquet"
    // two tight clusters; labels split WITHIN each cluster so the nearest
    // cross-label neighbor is a same-cluster point
    (0L until 40L).map { i =>
      val c = if (i % 2 == 0) 0f else 10f
      (i, Array(c + (i % 5) * 0.01f, c), s"L${i % 4 / 2}")
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(input)
    val r = Main.run(spark, Seq("hardneg", "--input", input, "--k", "3",
      "--anchors", "10")).collect()
    assert(r.length == 30) // 10 anchors x 3
    val labels = (0L until 40L).map(i => i -> s"L${i % 4 / 2}").toMap
    r.foreach { row =>
      val (q, n) = (row.getLong(0), row.getLong(1))
      assert(labels(q) != labels(n), s"pair ($q,$n) shares a label")
    }
  }

  test("pagerank, phrase, proximity, wand, rvq-encode and url-canon drive the session additions") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-s2").toString
    (0L until 40L).map(i => (i, (i * 7 + 1) % 40))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
      .write.parquet(s"$d/edges.parquet")
    val pr = Main.run(spark, Seq("pagerank", "--edges", s"$d/edges.parquet",
      "--iters", "5"))
    assert(pr.count() == 40)
    assert(math.abs(pr.agg(sum("rank")).head.getDouble(0) - 1.0) < 1e-9)

    Seq((0L, "slow hash batch here"), (1L, "hash batch"), (2L, "slow batch hash"))
      .toDF("doc_id", "text").write.parquet(s"$d/docs.parquet")
    val ph = Main.run(spark, Seq("phrase", "--input", s"$d/docs.parquet",
      "--terms", "slow,hash,batch"))
    assert(ph.select("id").as[Long].collect().toSet == Set(0L))
    val px = Main.run(spark, Seq("proximity", "--input", s"$d/docs.parquet",
      "--terms", "slow,hash", "--window", "2"))
    assert(px.select("id").as[Long].collect().toSet == Set(0L, 2L))
    val wd = Main.run(spark, Seq("wand", "--input", s"$d/docs.parquet",
      "--terms", "hash,batch", "--k", "2", "--block-size", "2"))
    assert(wd.count() == 2)
    val wc = Main.run(spark, Seq("wand", "--input", s"$d/docs.parquet",
      "--terms", "hash,batch", "--k", "2", "--card"))
    assert(wc.columns.contains("skipped_frac") && wc.count() == 1)

    val rnd = new scala.util.Random(7)
    (0L until 64L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").write.parquet(s"$d/vecs.parquet")
    val rv = Main.run(spark, Seq("rvq-encode", "--input", s"$d/vecs.parquet",
      "--stages", "2", "--k", "4"))
    assert(rv.count() == 64)
    val rc = Main.run(spark, Seq("rvq-encode", "--input", s"$d/vecs.parquet",
      "--stages", "2", "--k", "4", "--error-card"))
    assert(rc.count() == 2)

    Seq((0L, "HTTP://A.com:80/x?utm_a=1&b=2"), (1L, "http://a.com/x?b=2"))
      .toDF("doc_id", "url").write.parquet(s"$d/urls.parquet")
    val uc = Main.run(spark, Seq("url-canon", "--input", s"$d/urls.parquet"))
    assert(uc.select("canon_url").as[String].collect().toSet == Set("http://a.com/x?b=2"))
    val ud = Main.run(spark, Seq("url-canon", "--input", s"$d/urls.parquet",
      "--dedup-card"))
    assert(ud.count() == 1 && ud.head.getLong(2) == 2L)
  }

  test("pagerank --eps/--weight-col, coreness, hnsw-build/search drive the graph additions") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-s3").toString
    (0L until 40L).flatMap(i => Seq((i, (i * i + 1) % 40), (i, (i * i + 18) % 40)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (a, b, ((a + b) % 3 + 1).toDouble) }
      .toDF("src", "dst", "w").write.parquet(s"$d/edges.parquet")
    val pu = Main.run(spark, Seq("pagerank", "--edges", s"$d/edges.parquet",
      "--eps", "0.01", "--weight-col", "w"))
    assert(pu.columns.contains("iters_run") && pu.columns.contains("converged"))
    assert(pu.filter(col("converged")).count() == pu.count())
    assert(math.abs(pu.agg(sum("rank")).head.getDouble(0) - 1.0) < 1e-9)

    // K4 + tail: coreness 3 inside the clique, 1 on the tail
    ((for (i <- 0L until 4L; j <- 0L until 4L if i < j) yield (i, j)) ++
      Seq((3L, 10L), (10L, 11L))).toDF("src", "dst")
      .write.parquet(s"$d/kedges.parquet")
    val cn = Main.run(spark, Seq("coreness", "--edges", s"$d/kedges.parquet"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0L until 4L).forall(cn(_) == 3) && cn(11L) == 1, cn.toString)

    val rnd = new scala.util.Random(11)
    (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(8)(j => (if (j == c) 4f else 0f) + 0.2f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").write.parquet(s"$d/hvecs.parquet")
    val occ = Main.run(spark, Seq("hnsw-build", "--input", s"$d/hvecs.parquet",
      "--out", s"$d/hnsw", "--n-list", "4", "--m", "4", "--ef-construction", "16"))
    assert(occ.count() == 4, "one occupancy row per cell")
    val hs = Main.run(spark, Seq("hnsw-search", "--index", s"$d/hnsw",
      "--query", s"$d/hvecs.parquet", "--k", "3", "--n-probe", "2",
      "--ef", "8", "--exclude-self"))
    assert(hs.count() == 200 * 3)
    assert(hs.columns.toSet == Set("query_id", "neighbor_id", "rank", "dist"))
    assert(hs.filter(col("neighbor_id") === col("query_id")).count() == 0)

    // hnsw-maintain: tombstones hide immediately (searches return no
    // removed id, graph files untouched), compact reclaims them
    (0L until 200L by 10L).toDF("vec_id").write.parquet(s"$d/rm.parquet")
    val tomb = Main.run(spark, Seq("hnsw-maintain", "--bundle", s"$d/hnsw",
      "--tombstone", s"$d/rm.parquet")).collect().head
    assert(tomb.getLong(0) == 200 && tomb.getLong(1) == 20, tomb.toString)
    val hsAfter = Main.run(spark, Seq("hnsw-search", "--index", s"$d/hnsw",
      "--query", s"$d/hvecs.parquet", "--k", "3", "--n-probe", "2",
      "--ef", "1048576", "--exclude-self"))
    assert(hsAfter.filter(col("neighbor_id") % 10 === 0).count() == 0,
      "tombstoned ids surfaced in search results")
    val comp = Main.run(spark, Seq("hnsw-maintain", "--bundle", s"$d/hnsw",
      "--compact", "--m", "4", "--ef-construction", "16")).collect().head
    assert(comp.getLong(0) == 180 && comp.getLong(1) == 0, comp.toString)
  }

  test("hits, scc, katz, harmonic, walks, textrank, funnel, transitions, matryoshka smoke") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-s4").toString
    (0L until 30L).flatMap(i => Seq(0, 1, 2).map(j => (i, (i * i + 1 + 17 * j) % 30)))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
      .write.parquet(s"$d/edges.parquet")

    val ht = Main.run(spark, Seq("hits", "--edges", s"$d/edges.parquet", "--iters", "4"))
    assert(ht.columns.toSet == Set("id", "hub", "auth"))
    assert(math.abs(ht.agg(sum("hub")).head.getDouble(0) - 1.0) < 1e-9)

    val sc = Main.run(spark, Seq("scc", "--edges", s"$d/edges.parquet"))
    assert(sc.count() == 30 && sc.columns.toSet == Set("id", "scc"))
    val cd = Main.run(spark, Seq("scc", "--edges", s"$d/edges.parquet", "--condense"))
    assert(cd.columns.toSet == Set("scc_src", "scc_dst", "cnt"))
    val bt = Main.run(spark, Seq("scc", "--edges", s"$d/edges.parquet", "--bowtie"))
    assert(bt.columns.toSet == Set("id", "cls"))
    assert(bt.select("cls").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("core", "in", "out", "other")))

    val kz = Main.run(spark, Seq("katz", "--edges", s"$d/edges.parquet",
      "--iters", "4", "--alpha", "0.1"))
    assert(kz.count() == 30)
    assert(kz.agg(min("katz")).head.getDouble(0) >= 1.0)

    val hc = Main.run(spark, Seq("harmonic", "--edges", s"$d/edges.parquet",
      "--radius", "2"))
    assert(hc.columns.toSet == Set("id", "harmonic"))
    val nf = Main.run(spark, Seq("harmonic", "--edges", s"$d/edges.parquet",
      "--radius", "2", "--nf"))
    assert(nf.columns.toSet == Set("id", "dist", "cnt", "ball"))
    val hb = Main.run(spark, Seq("harmonic", "--edges", s"$d/edges.parquet",
      "--radius", "2", "--hyperball"))
    assert(hb.columns.toSet == Set("id", "dist", "est"))

    (0L until 30L by 5L).toDF("id").write.parquet(s"$d/starts.parquet")
    val ss = Main.run(spark, Seq("sssp", "--edges", s"$d/edges.parquet",
      "--starts", s"$d/starts.parquet", "--seeds", s"$d/starts.parquet",
      "--rounds", "2", "--weight-col", "dst"))
    assert(ss.columns.toSet == Set("id", "dist"))
    assert(ss.filter(col("dist") === 0.0).count() == 6, "seeds at distance 0")
    val wk = Main.run(spark, Seq("walks", "--edges", s"$d/edges.parquet",
      "--starts", s"$d/starts.parquet", "--length", "3"))
    assert(wk.filter(col("step") === 0).count() == 6)
    val wp = Main.run(spark, Seq("walks", "--edges", s"$d/edges.parquet",
      "--starts", s"$d/starts.parquet", "--length", "3", "--pairs", "--window", "2"))
    assert(wp.columns.toSet == Set("walk_id", "step", "center", "context"))

    Seq((0L, "alpha beta gamma alpha beta"), (1L, "beta gamma alpha beta gamma"))
      .toDF("doc_id", "text").write.parquet(s"$d/docs.parquet")
    val tr = Main.run(spark, Seq("textrank", "--input", s"$d/docs.parquet",
      "--k", "3", "--min-count", "1"))
    assert(tr.count() == 3 && tr.columns.toSet == Set("token", "rank"))

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0L until 40L).map(i => (i, i % 10,
        Seq("view", "click", "purchase", "view")(((i / 10) % 4).toInt),
        new java.sql.Timestamp(t0.getTime + i * 60000)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(s"$d/events.parquet")
    val fn = Main.run(spark, Seq("funnel", "--events", s"$d/events.parquet",
      "--steps", "view,click,purchase"))
    assert(fn.count() == 3)
    val tm = Main.run(spark, Seq("transitions", "--events", s"$d/events.parquet"))
    assert(tm.columns.toSet == Set("from_type", "to_type", "cnt", "p"))

    (0L until 60L).map(i => (i, Array.tabulate(16)(j =>
        (if (j < 4) ((i % 5) - 2).toFloat else 0.01f * ((i + j) % 7)))))
      .toDF("vec_id", "embedding").write.parquet(s"$d/m.parquet")
    val mk = Main.run(spark, Seq("matryoshka", "--query", s"$d/m.parquet",
      "--base", s"$d/m.parquet", "--dims", "4,16", "--k", "5"))
    assert(mk.count() == 2 && mk.columns.toSet == Set("dims", "avg_recall"))
  }

  test("convert file round-trips fvec through csv, json and parquet") {
    val d = Files.createTempDirectory("graft-cli-cv").toString
    def vecs(path: String): Map[Long, Seq[Float]] =
      XvecIO.read(spark, path).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val want = vecs(s"$dir/base.fvec")

    val r1 = Main.run(spark, Seq("convert", "file",
      "--input", s"$dir/base.fvec", "--output", s"$d/v.csv")).collect().head
    assert(r1.getLong(2) == 100)
    Main.run(spark, Seq("convert", "--input", s"$d/v.csv",
      "--output", s"$d/back1.fvec"))
    assert(vecs(s"$d/back1.fvec") == want, "fvec -> csv -> fvec diverged")

    Main.run(spark, Seq("convert", "--input", s"$dir/base.fvec",
      "--output", s"$d/v.json"))
    Main.run(spark, Seq("convert", "--input", s"$d/v.json",
      "--output", s"$d/back2.fvec"))
    assert(vecs(s"$d/back2.fvec") == want, "fvec -> json -> fvec diverged")

    Main.run(spark, Seq("convert", "--input", s"$dir/base.fvec",
      "--output", s"$d/v.parquet"))
    Main.run(spark, Seq("convert", "--input", s"$d/v.parquet",
      "--output", s"$d/back3.fvec"))
    assert(vecs(s"$d/back3.fvec") == want, "fvec -> parquet -> fvec diverged")
  }

  test("check-endian: little-endian, byte-swapped, and garbage fixtures") {
    // base.fvec is a valid little-endian file (dim 16)
    val ok = Main.run(spark, Seq("check-endian", "--input", s"$dir/base.fvec"))
      .collect().head
    assert(ok.getString(5) == "little-endian", ok.toString)

    // byte-swap every int32 word: an fvec is all 4-byte words (dim
    // headers + float components), so the swapped file is exactly what a
    // byte-order-naive writer produces — the check must call it BE
    val src = Files.readAllBytes(Paths.get(s"$dir/base.fvec"))
    val swapped = new Array[Byte](src.length)
    var i = 0
    while (i < src.length) {
      swapped(i) = src(i + 3); swapped(i + 1) = src(i + 2)
      swapped(i + 2) = src(i + 1); swapped(i + 3) = src(i)
      i += 4
    }
    Files.write(Paths.get(s"$dir/swapped.fvec"), swapped)
    val be = Main.run(spark, Seq("check-endian", "--input", s"$dir/swapped.fvec"))
      .collect().head
    assert(be.getString(5) == "big-endian", be.toString)

    // garbage: neither order yields a plausible (dim, stride) pair
    Files.write(Paths.get(s"$dir/garbage.fvec"),
      Array.tabulate[Byte](37)(j => (j * 41 + 7).toByte))
    val bad = Main.run(spark,
      Seq("check-endian", "--input", s"$dir/garbage.fvec")).collect().head
    assert(bad.getString(5) == "invalid", bad.toString)

    // multi-file invocation keeps one row per file
    val multi = Main.run(spark, Seq("check-endian", "--input",
      s"$dir/base.fvec,$dir/swapped.fvec,$dir/garbage.fvec"))
    assert(multi.count() == 3)
  }

  test("huggingface dl + list against the loopback HF tree") {
    import graft.operators.HttpFixture
    val d = Files.createTempDirectory("graft-hf-cli").toString
    val repo = "cli-org/cli-repo"
    val src = s"$dir/base.fvec"
    val size = Files.size(Paths.get(src))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(Paths.get(src))).map("%02x".format(_)).mkString
    Files.write(Paths.get(d, "api.json"),
      (s"""{"id":"$repo","sha":"main","siblings":[""" +
        s"""{"rfilename":"base.fvec","size":$size,""" +
        s""""lfs":{"sha256":"$sha","size":$size}},""" +
        s"""{"rfilename":"README.md"}]}""").getBytes("UTF-8"))
    HttpFixture.serveAt(s"api/datasets/$repo", s"$d/api.json")
    HttpFixture.serveAt(s"datasets/$repo/resolve/main/base.fvec", src)
    val endpoint = HttpFixture.endpoint()

    val listing = Main.run(spark, Seq("huggingface", "--repo", repo,
      "--list", "--endpoint", endpoint)).collect()
    assert(listing.map(_.getString(0)).toSet == Set("base.fvec", "README.md"))
    assert(listing.find(_.getString(0) == "base.fvec").get.getString(2) == sha)

    val out = s"$d/out"
    val report = Main.run(spark, Seq("huggingface", "dl", "--repo", repo,
      "--file", "base.fvec", "--output", out, "--endpoint", endpoint,
      "--sha256", sha))
    assert(report.filter(!col("valid")).count() == 0)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$out/base.fvec")),
      Files.readAllBytes(Paths.get(src))), "downloaded bytes differ")

    // corrupted expectation fails loudly, never a silent partial acquire
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, Seq("huggingface", "dl", "--repo", repo,
        "--file", "base.fvec", "--output", s"$d/out2", "--endpoint", endpoint,
        "--sha256", "0" * 64))
    }
    assert(e.getMessage.contains("sha256 mismatch"))
  }

  test("merkle create/verify/diff: intact file verifies, corrupted chunk surfaces") {
    val d = Files.createTempDirectory("graft-cli-merkle").toString
    val rnd = new scala.util.Random(11)
    // >1 MiB so the spec sizing yields MULTIPLE 1 MiB chunks (3 leaves,
    // capacity 4, 7-node flat tree) — sub-MiB content is one chunk by spec
    val bytes = Array.fill(3 * 1024 * 1024 - 500)(rnd.nextInt().toByte)
    Files.write(Paths.get(d, "data.bin"), bytes)
    val tree = Main.run(spark, Seq("merkle", "create", "--file", s"$d/data.bin",
      "--output", s"$d/tree.parquet"))
    assert(tree.count() == 7, "3 leaves pad to capacity 4 -> 7 flat nodes")
    // intact file → empty mismatch set
    val ok = Main.run(spark, Seq("merkle", "verify", "--file", s"$d/data.bin",
      "--reference", s"$d/tree.parquet"))
    assert(ok.count() == 0, "intact file must verify clean")
    // corrupt one byte mid-file → exactly that chunk mismatches
    val corrupted = bytes.clone()
    corrupted(2 * 1024 * 1024 + 100) = (corrupted(2 * 1024 * 1024 + 100) ^ 0x7f).toByte
    Files.write(Paths.get(d, "bad.bin"), corrupted)
    val bad = Main.run(spark, Seq("merkle", "verify", "--file", s"$d/bad.bin",
      "--reference", s"$d/tree.parquet")).collect()
    assert(bad.length == 1, s"one corrupted chunk expected: ${bad.mkString}")
    val diff = Main.run(spark, Seq("merkle", "diff", "--a", s"$d/data.bin",
      "--b", s"$d/bad.bin")).collect()
    assert(diff.length == 1 && diff.head.getInt(0) == bad.head.getInt(0))
  }

  test("jjq extracts json paths from line-delimited docs (positional + flag forms)") {
    val d = Files.createTempDirectory("graft-cli-jjq").toString
    Files.write(Paths.get(d, "docs.jsonl"),
      ("""{"name":"mnist","dims":784,"tags":["img","small"]}""" + "\n" +
        """{"name":"sift","dims":128,"tags":["img"]}""" + "\n").getBytes("UTF-8"))
    val names = Main.run(spark, Seq("jjq", ".name", s"$d/docs.jsonl"))
      .collect().map(_.getString(0)).toSet
    assert(names == Set("mnist", "sift"))
    val firstTags = Main.run(spark, Seq("jjq", "--expr", ".tags[0]",
      "--input", s"$d/docs.jsonl")).collect().map(_.getString(0)).toSet
    assert(firstTags == Set("img"))
  }

  test("datasets list/info/download drive the catalog + ranged transport") {
    val d = Files.createTempDirectory("graft-cli-datasets").toString
    val payload = "the dataset payload bytes".getBytes("UTF-8")
    Files.write(Paths.get(d, "blob.bin"), payload)
    Files.write(Paths.get(d, "catalog.yaml"),
      (s"""- name: mnist-784-euclidean
          |  url: file://$d/blob.bin
          |  attributes: {dims: "784", metric: euclidean}
          |- name: glove-25-angular
          |  url: file://$d/blob.bin
          |  attributes: {dims: "25", metric: angular}
          |""".stripMargin).getBytes("UTF-8"))
    val all = Main.run(spark, Seq("datasets", "list", "--at", s"$d/catalog.yaml"))
      .collect().map(_.getString(0)).toSet
    assert(all == Set("mnist-784-euclidean", "glove-25-angular"))
    val filtered = Main.run(spark, Seq("datasets", "list", "--at",
      s"$d/catalog.yaml", "--filter", "*-euclidean")).collect()
    assert(filtered.map(_.getString(0)).toSeq == Seq("mnist-784-euclidean"))
    val info = Main.run(spark, Seq("datasets", "info", "--at",
      s"$d/catalog.yaml", "--name", "glove*")).collect()
    assert(info.map(r => r.getString(2) -> r.getString(3)).toMap ==
      Map("dims" -> "25", "metric" -> "angular"))
    val report = Main.run(spark, Seq("datasets", "download", "--at",
      s"$d/catalog.yaml", "--spec", "mnist*:default", "--output", s"$d/dl"))
    assert(report.filter(!col("valid")).count() == 0)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$d/dl/blob.bin")), payload))
  }

  test("fetch --url pulls a file through the ranged transport with sha verify") {
    val d = Files.createTempDirectory("graft-cli-fetch").toString
    val rnd = new scala.util.Random(13)
    val payload = Array.fill(100000)(rnd.nextInt().toByte)
    Files.write(Paths.get(d, "remote.bin"), payload)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    val report = Main.run(spark, Seq("fetch", "--url", s"file://$d/remote.bin",
      "--output", s"$d/local.bin", "--sha256", sha))
    assert(report.filter(!col("valid")).count() == 0)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$d/local.bin")), payload))
    // preflight marker is cleaned up after the probe
    assert(!new java.io.File(d).listFiles()
      .exists(_.getName.startsWith(".graft-sharedfs-probe")),
      "shared-fs probe marker must not survive the fetch")
  }

  test("cleanup cleanfvec drops zero and duplicate vectors, writes the cleaned file") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-cleanup").toString
    val vecs = Seq(
      (0L, Array(1f, 2f)), (1L, Array(0f, 0f)),      // zero → dropped
      (2L, Array(1f, 2f)),                            // dup of 0 → dropped
      (3L, Array(3f, 4f)), (4L, Array(0f, 0f)))       // zero → dropped
    XvecIO.write(vecs.toDF("ordinal", "vector"), s"$d/raw.fvec")
    val summary = Main.run(spark, Seq("cleanup", "cleanfvec", "--input",
      s"$d/raw.fvec", "--output", s"$d/clean.fvec")).collect().head
    assert(summary.getLong(1) == 5 && summary.getLong(2) == 2)
    val kept = XvecIO.read(spark, s"$d/clean.fvec")
      .collect().map(_.getAs[scala.collection.Seq[Float]]("vector").toSeq).toSet
    assert(kept == Set(Seq(1f, 2f), Seq(3f, 4f)))
  }

  test("generate ivec-shuffle: seeded deterministic permutation, valid xvec out") {
    val d = Files.createTempDirectory("graft-cli-shuffle").toString
    val perm1 = Main.run(spark, Seq("generate", "ivec-shuffle", "--input",
      s"$dir/base.fvec", "--seed", "7", "--output", s"$d/shuf.fvec"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perm2 = Main.run(spark, Seq("ivec-shuffle", "--input",
      s"$dir/base.fvec", "--seed", "7")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perm1 == perm2, "same seed → same permutation (both spellings)")
    assert(perm1.keySet == (0L until 100L).toSet)
    assert(perm1.values.toSet == (0L until 100L).toSet, "a true permutation")
    assert(perm1 != perm1.map { case (k, _) => k -> k },
      "seeded shuffle must not be the identity")
    // the written file is a valid ordinal-ordered xvec: row i carries the
    // vector of source ordinal perm1(i)
    val orig = XvecIO.read(spark, s"$dir/base.fvec").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("vector").toSeq).toMap
    val shuf = XvecIO.read(spark, s"$d/shuf.fvec").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("vector").toSeq).toMap
    assert(shuf.keySet == (0L until 100L).toSet)
    (0L until 100L).foreach { i =>
      assert(shuf(i) == orig(perm1(i)), s"row $i must carry source ${perm1(i)}")
    }
  }

  test("cdx-index and cdx-fetch: sorted index, prefix probe, offset reads") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-cdx").toString
    val rows = Seq(
      ("http://alpha.example.com/1", "<p>Alpha page one with enough characters to keep.</p>"),
      ("http://alpha.example.com/2", "<p>Alpha page two with enough characters to keep.</p>"),
      ("http://beta.example.com/1", "<p>Beta page one with enough characters to keep.</p>"))
    graft.sources.WarcIO.write(rows.toDF("url", "payload"), s"$d/s.warc")
    val idx = Main.run(spark, Seq("cdx-index", "--input", s"$d/s.warc",
      "--output", s"$d/s.cdxj"))
    assert(idx.count() == 3)
    val fetched = Main.run(spark, Seq("cdx-fetch", "--index", s"$d/s.cdxj",
      "--urlkey-prefix", "com,example,alpha)"))
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fetched.keySet ==
      Set("http://alpha.example.com/1", "http://alpha.example.com/2"))
    assert(fetched.values.forall(_.contains("Alpha page")))
  }

  test("link-extract resolves hrefs against the page url via the CLI") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-links").toString
    Seq((1L, "http://h.example.com/a/p",
        """<a href="/x">root</a> <a href="y">rel</a> <a href="mailto:m@x">m</a>"""))
      .toDF("doc_id", "url", "html").write.parquet(s"$d/pages.parquet")
    val links = Main.run(spark, Seq("link-extract", "--input", s"$d/pages.parquet"))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(links == Map("http://h.example.com/x" -> "root",
      "http://h.example.com/a/y" -> "rel"))
  }

  test("wet-export writes conversion records readable back via warc-read") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-wet").toString
    Seq((1L, "http://x.example.com/1", "first extracted text"),
        (2L, "http://x.example.com/2", "second extracted text"))
      .toDF("doc_id", "url", "text").write.parquet(s"$d/texts.parquet")
    val receipt = Main.run(spark, Seq("wet-export", "--input",
      s"$d/texts.parquet", "--output", s"$d/c.wet.warc.gz")).collect().head
    assert(receipt.getLong(1) == 2)
    val back = Main.run(spark, Seq("warc-read", "--input", s"$d/c.wet.warc.gz"))
      .select("warc_type", "text").collect()
    assert(back.forall(_.getString(0) == "conversion"))
    assert(back.map(_.getString(1)).toSet ==
      Set("first extracted text", "second extracted text"))
  }

  test("robots-filter joins per-host rules and emits verdicts via the CLI") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-robots").toString
    Seq((1L, "http://h.test/ok/1"), (2L, "http://h.test/blocked/2"))
      .toDF("doc_id", "url").write.parquet(s"$d/pages.parquet")
    Seq(("h.test", "User-agent: *\nDisallow: /blocked/\n"))
      .toDF("host", "robots_txt").write.parquet(s"$d/robots.parquet")
    val got = Main.run(spark, Seq("robots-filter", "--pages", s"$d/pages.parquet",
      "--robots", s"$d/robots.parquet", "--agent", "graftbot"))
      .select("doc_id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  test("sitemap-extract explodes urlset documents via the CLI") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-sitemap").toString
    Seq(("h.test", "<urlset><url><loc>http://h.test/a</loc>" +
        "<lastmod>2026-03-01</lastmod></url>" +
        "<url><loc>http://h.test/b</loc></url></urlset>"))
      .toDF("host", "xml").write.parquet(s"$d/maps.parquet")
    val got = Main.run(spark, Seq("sitemap-extract", "--input", s"$d/maps.parquet"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(("http://h.test/a", "2026-03-01"), ("http://h.test/b", "")))
  }

  test("image-hash emits dhashes and --pairs finds the planted twin") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-imghash").toString
    def img(seed: Int, tweak: Boolean) = {
      val px = Array.tabulate(9 * 8 * 3)(j => ((seed * 37 + j * 7) % 256).toByte)
      if (tweak) px(0) = ((px(0) & 0xff) ^ 0x20).toByte
      graft.operators.MediaCodecs.encodePpm(9, 8, px)
    }
    Seq((1L, img(1, false)), (2L, img(2, false)), (101L, img(1, true)))
      .toDF("doc_id", "payload").write.parquet(s"$d/imgs.parquet")
    val hashes = Main.run(spark, Seq("image-hash", "--input", s"$d/imgs.parquet"))
    assert(hashes.filter(col("dhash").isNotNull).count() == 3)
    val pairs = Main.run(spark, Seq("image-hash", "--input", s"$d/imgs.parquet",
      "--pairs", "--max-hamming", "6", "--chunks", "8")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L)), s"planted twin only: $pairs")
  }

  test("audio-hash emits fingerprints and --pairs finds the renormalized twin") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-audiohash").toString
    def clip(seed: Int, scale: Int) = graft.operators.MediaCodecs.encodeWav(8000,
      Array.tabulate[Short](65 * 16)(i =>
        (((seed * 67 + i * 29) % 1201 - 600) / scale * scale).toShort))
    Seq((1L, clip(1, 1)), (2L, clip(2, 1)), (101L, clip(1, 2)))
      .toDF("doc_id", "payload").write.parquet(s"$d/clips.parquet")
    val hashes = Main.run(spark, Seq("audio-hash", "--input", s"$d/clips.parquet"))
    assert(hashes.filter(col("ahash").isNotNull).count() == 3)
    val pairs = Main.run(spark, Seq("audio-hash", "--input", s"$d/clips.parquet",
      "--pairs", "--max-hamming", "6", "--chunks", "8")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L)), s"requantized twin only: $pairs")
  }

  test("frontier schedules the next wave: seen excluded, caps enforced via the CLI") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-frontier").toString
    (0 until 20).map(i => (s"http://f${i % 2}.test/$i", i))
      .toDF("url", "score").write.parquet(s"$d/cand.parquet")
    Seq("http://f0.test/18", "http://f1.test/19")
      .toDF("url").write.parquet(s"$d/seen.parquet")
    val wave = Main.run(spark, Seq("frontier", "--candidates", s"$d/cand.parquet",
      "--seen", s"$d/seen.parquet", "--per-host", "3", "--total", "5"))
      .collect()
    assert(wave.length == 5)
    assert(!wave.exists(r => r.getString(0).endsWith("/18") ||
      r.getString(0).endsWith("/19")), "seen urls never reschedule")
    assert(wave.groupBy(_.getString(2)).values.forall(_.length <= 3))
    // best fresh scores win: 16,17 then 14,15,13
    assert(wave.map(_.getInt(1)).sorted.reverse.toSeq == Seq(17, 16, 15, 14, 13))
  }

  test("media-probe names compressed containers without decoding") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-probe").toString
    Seq(
      (1L, graft.operators.MediaCodecs.encodeMp3Silence(25, 128)),
      (2L, graft.operators.MediaCodecs.encodeMp4Stub(4200, 320, 240)),
      (3L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "bytes").write.parquet(s"$d/media.parquet")
    val got = Main.run(spark, Seq("media-probe", "--input", s"$d/media.parquet"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "mp3" && got(1L).getInt(6) == 128)
    assert(got(2L).getString(1) == "mp4" && got(2L).getLong(3) == 4200)
    assert(got(3L).isNullAt(1))
  }

  test("cdx-index --shards and wet-export --shards write the scale layouts") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-shards").toString
    (0 until 30).map(i => (s"http://h${i % 5}.test/p/$i", s"Body text $i."))
      .toDF("url", "text").write.parquet(s"$d/texts.parquet")
    val wetReceipt = Main.run(spark, Seq("wet-export", "--input",
      s"$d/texts.parquet", "--output", s"$d/wet", "--shards", "3")).collect()
    assert(wetReceipt.length == 3 && wetReceipt.map(_.getLong(1)).sum == 30)
    val cdxReceipt = Main.run(spark, Seq("cdx-index", "--input", s"$d/wet",
      "--output", s"$d/cdx", "--shards", "3")).collect()
    assert(cdxReceipt.map(_.getLong(1)).sum == 30)
    assert(Files.exists(java.nio.file.Paths.get(s"$d/cdx/cluster.idx")))
    assert(graft.sources.CdxIO.readCdxjShards(spark, s"$d/cdx").count() == 30)
  }

  test("frontier --delays converts crawl-delay rates into per-wave budgets") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli-fdelay").toString
    (0 until 10).map(i => (s"http://slow.test/$i", 100 - i))
      .toDF("url", "score").write.parquet(s"$d/cand.parquet")
    Seq.empty[String].toDF("url").write.parquet(s"$d/seen.parquet")
    Seq(("slow.test", 3.0)).toDF("host", "crawl_delay")
      .write.parquet(s"$d/delays.parquet")
    val wave = Main.run(spark, Seq("frontier", "--candidates", s"$d/cand.parquet",
      "--seen", s"$d/seen.parquet", "--per-host", "9", "--total", "9",
      "--delays", s"$d/delays.parquet", "--wave-seconds", "6")).collect()
    assert(wave.length == 2, s"floor(6s / 3s delay) = 2 fetches, got ${wave.length}")
  }

  test("unknown command fails with usage") {
    val e = intercept[IllegalArgumentException](Main.run(spark, Seq("frobnicate")))
    assert(e.getMessage.contains("usage"))
  }
}
