package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.layout.{Catalog, FWindow, GraftDataset}
import graft.sources.slab.SlabTable
import graft.sources.xvec.XvecFormat

class SlabCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Paths.get("target", name + "-" + System.nanoTime())
    d.toString
  }

  test("slab append enforces strictly ascending ordinals per namespace") {
    val slab = new SlabTable(spark, freshDir("slab"))
    slab.append("main", Seq((0L, "a".getBytes), (1L, "b".getBytes)).toDF("ordinal", "data"))
    slab.append("main", Seq((5L, "c".getBytes)).toDF("ordinal", "data"))
    intercept[IllegalArgumentException] {
      slab.append("main", Seq((3L, "x".getBytes)).toDF("ordinal", "data"))
    }
    // other namespaces are independent
    slab.append("other", Seq((0L, "z".getBytes)).toDF("ordinal", "data"))
    assert(slab.maxOrdinal("main") == 5L)
    assert(new String(slab.get("main", 5L).get) == "c")
    assert(slab.get("main", 3L).isEmpty)
  }

  test("delete tombstones hide rows everywhere; compact reclaims and keeps the watermark") {
    val slab = new SlabTable(spark, freshDir("slab-gc"))
    slab.append("ns", (0L until 50L).map(i => (i, s"r$i".getBytes)).toDF("ordinal", "data"))
    slab.delete("ns", Seq(10L, 20L, 49L).toDF("ordinal"))
    // visible immediately, before any compaction
    assert(slab.get("ns", 10L).isEmpty && slab.get("ns", 11L).isDefined)
    assert(slab.read("ns").count() == 47L)
    assert(slab.deadCount("ns") == 3L)
    assert(slab.maxOrdinal("ns") == 49L) // high watermark counts dead rows

    slab.compact("ns")
    assert(slab.deadCount("ns") == 0L)
    assert(slab.read("ns").count() == 47L)
    assert(slab.maxOrdinal("ns") == 49L,
      "the reclaimed top ordinal must not be reusable")
    // ascending-append still measured against the watermark
    intercept[IllegalArgumentException] {
      slab.append("ns", Seq((49L, "again".getBytes)).toDF("ordinal", "data"))
    }
    slab.append("ns", Seq((50L, "next".getBytes)).toDF("ordinal", "data"))
    assert(new String(slab.get("ns", 50L).get) == "next")
  }

  test("compacting a fully-deleted namespace leaves an empty live view with the watermark") {
    val slab = new SlabTable(spark, freshDir("slab-gc-all"))
    slab.append("ns", (0L until 5L).map(i => (i, s"r$i".getBytes)).toDF("ordinal", "data"))
    slab.delete("ns", (0L until 5L).toDF("ordinal"))
    slab.compact("ns")
    assert(slab.read("ns").count() == 0L)
    assert(slab.maxOrdinal("ns") == 4L)
    intercept[IllegalArgumentException] {
      slab.append("ns", Seq((2L, "x".getBytes)).toDF("ordinal", "data"))
    }
  }

  test("multi-get returns submission order with nulls for misses (J5)") {
    val slab = new SlabTable(spark, freshDir("slab-mg"))
    slab.append("ns", (0L until 20L).map(i => (i, s"rec$i".getBytes)).toDF("ordinal", "data"))
    val req = Seq((0L, 15L), (1L, 3L), (2L, 99L), (3L, 7L)).toDF("request_idx", "ordinal")
    val got = slab.getAll("ns", req).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(15L, 3L, 99L, 7L))
    assert(new String(got(0).getAs[Array[Byte]](2)) == "rec15")
    assert(got(2).isNullAt(2))
  }

  test("import/export round trip with ordinal assignment (S21/S22) + stats (A15)") {
    val dir = freshDir("slab-io")
    val slab = new SlabTable(spark, dir)
    val txt = java.nio.file.Paths.get("target", s"slab-in-${System.nanoTime()}.txt")
    java.nio.file.Files.write(txt, "alpha\nbeta\ngamma\n".getBytes)
    slab.importText("docs", txt.toString)
    assert(slab.read("docs").count() == 3)
    assert(new String(slab.get("docs", 0L).get) == "alpha")
    val stats = slab.stats().collect()
    assert(stats.exists(r => r.getString(0) == "docs" && r.getLong(1) == 3))
    val out = freshDir("slab-out")
    slab.exportText("docs", out)
    val lines = spark.read.text(out).collect().map(_.getString(0)).toSet
    assert(lines == Set("alpha", "beta", "gamma"))
  }

  test("catalog match/select semantics (P10/J6)") {
    val entries = Seq(
      Catalog.DatasetEntry("bigann-1M", "url1", Map.empty, Map.empty),
      Catalog.DatasetEntry("bigann-10M", "url2", Map.empty, Map.empty),
      Catalog.DatasetEntry("glove-25", "url3", Map.empty, Map.empty))
    assert(Catalog.findExact(entries, "glove-25").get.url == "url3")
    assert(Catalog.matchGlob(entries, "bigann-*").size == 2)
    assert(Catalog.matchRegex(entries, "bigann-1.*").map(_.name) == Seq("bigann-1M", "bigann-10M"))
    assert(Catalog.matchOne(entries, "glove*").name == "glove-25")
    intercept[IllegalArgumentException](Catalog.matchOne(entries, "bigann-*"))
    val (e, p) = Catalog.select(entries, "glove-25:5M")
    assert(e.name == "glove-25" && p == "5M")
  }

  test("token templating (P11)") {
    assert(Catalog.templatize("data/${name}_base.fvec", Map("name" -> "test")) ==
      "data/test_base.fvec")
    intercept[IllegalArgumentException](Catalog.templatize("${missing}", Map.empty))
  }

  test("dataset.yaml: profiles, facet aliases, windows, inheritance (P12)") {
    val yaml =
      """attributes:
        |  distance_function: COSINE
        |  license: APL
        |profiles:
        |  default:
        |    base: data_base.fvec
        |    query: data_query.fvec
        |    indices: data_indices.ivec
        |  small:
        |    base:
        |      source: data_base.fvec
        |      window: "[0..100)"
        |""".stripMargin
    val entry = Catalog.parseDatasetYaml("testset", yaml)
    assert(entry.attributes("distance_function") == "COSINE")
    val small = entry.profiles("small")
    // inherited facets from default + overridden base window
    assert(small.facets.keySet ==
      Set("base_vectors", "query_vectors", "neighbor_indices"))
    assert(small.facets("base_vectors").window.count == 100)
    assert(Catalog.attrValue(entry, "/profiles/small/base:window").get == "0..100")
    assert(Catalog.attrValue(entry, "/attributes:license").get == "APL")
  }

  test("GraftDataset end-to-end: dataset.yaml -> windowed facet frames + zip join (J1/J7)") {
    val dir = java.nio.file.Paths.get("target", "ds-" + System.nanoTime())
    java.nio.file.Files.createDirectories(dir)
    XvecFormat.writeLocal(s"$dir/base.fvec", XvecFormat.Fvec,
      (0 until 50).map(i => Seq[Any](i.toFloat, (i * 2).toFloat)).iterator)
    XvecFormat.writeLocal(s"$dir/idx.ivec", XvecFormat.Ivec,
      (0 until 50).map(i => Seq[Any](i, i + 1)).iterator)
    java.nio.file.Files.write(dir.resolve("dataset.yaml"),
      """profiles:
        |  default:
        |    base: base.fvec
        |    indices: idx.ivec
        |  windowed:
        |    base:
        |      source: base.fvec
        |      window: "[10..20)"
        |    indices:
        |      source: idx.ivec
        |      window: "[10..20)"
        |""".stripMargin.getBytes)
    val ds = GraftDataset.load(spark, dir.toString)
    assert(ds.profiles == Seq("default", "windowed"))
    val w = ds.profile("windowed")
    val base = w.facet("base")
    assert(base.count() == 10)
    // logical ordinals are contiguous 0..9, physical 10..19
    val rows = base.orderBy("ordinal").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
    assert(rows.map(_.getLong(1)).toSeq == (10L until 20L))
    val zipped = w.zipped("base", "indices")
    assert(zipped.count() == 10)
    assert(zipped.columns.toSeq == Seq("ordinal", "base_vector", "indices_vector"))
  }

  test("parquet facet gets contiguous ordinals and array-column detection") {
    val dir = java.nio.file.Paths.get("target", "dsp-" + System.nanoTime())
    java.nio.file.Files.createDirectories(dir)
    // parquet facet with an `embedding` array column and NO ordinal column
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("embedding").limit(40).coalesce(1)
      .write.parquet(s"$dir/emb.parquet")
    java.nio.file.Files.write(dir.resolve("dataset.yaml"),
      """profiles:
        |  default:
        |    base: emb.parquet
        |  slice:
        |    base:
        |      source: emb.parquet
        |      window: "[10..20)"
        |""".stripMargin.getBytes)
    val ds = GraftDataset.load(spark, dir.toString)
    val all = ds.profile("default").facet("base")
    // contiguous 0..39 regardless of partitioning
    assert(all.select("ordinal").collect().map(_.getLong(0)).sorted.toSeq == (0L until 40L))
    val sliced = ds.profile("slice").facet("base").orderBy("ordinal").collect()
    assert(sliced.length == 10)
    assert(sliced.map(_.getLong(0)).toSeq == (0L until 10L))    // logical
    assert(sliced.map(_.getLong(1)).toSeq == (10L until 20L))   // physical
  }
}
