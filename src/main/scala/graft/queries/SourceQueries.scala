package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Merkle
import graft.sources.slab.SlabTable
import graft.sources.xvec.XvecIO

/** Source/format layer exercised through the correctness gate: xvec DSv2
  * round trip (S1/S18 + P2 window pushdown), slab multi-get (S10/S19/J5),
  * merkle leaf hashing + fold (A12). The oracles never read the binary
  * formats — they recompute the expected result from the parquet tables,
  * which is exactly what makes these round-trip checks meaningful.
  */
object SourceQueries {

  val all: Seq[GQuery] = Seq(

    // Write embeddings → fvec, read back through the DSv2 with a window —
    // output must equal the original rows in [100, 200).
    GQuery(
      "q52_xvec_roundtrip",
      """SELECT vec_id AS ordinal, len(embedding) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE*x::DOUBLE))), 6) AS norm
        |FROM embeddings WHERE vec_id >= 100 AND vec_id < 200""".stripMargin) { (s, dir) =>
      val path = s"${tmpDir()}/rt-${System.nanoTime()}.fvec"
      val src = Tables.embeddings(s, dir)
        .select(col("vec_id").as("ordinal"), col("embedding").as("vector"))
      XvecIO.write(src, path)
      XvecIO.read(s, path, window = "[100..200)")
        .select(col("ordinal"), size(col("vector")).as("dim"),
          round(graft.functions.VectorFunctions.vectorNorm(col("vector")), 6).as("norm"))
    },

    // DSv2 aggregate pushdown: count/min/max over a windowed xvec scan
    // answer from the file header + interval arithmetic alone — the scan
    // plans ONE metadata partition and reads zero payload bytes (XvecSpec
    // asserts the aggPushed plan marker; at 100 TB a dataset count is
    // O(files) metadata reads). The oracle counts the same slice on the
    // source table the file was written from.
    GQuery(
      "q203_xvec_agg_pushdown",
      """SELECT count(*) AS n, min(vec_id) AS mn, max(vec_id) AS mx
        |FROM embeddings WHERE vec_id < 300""".stripMargin) { (s, dir) =>
      val path = s"${tmpDir()}/aggpush-${System.nanoTime()}.fvec"
      XvecIO.write(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("ordinal"), col("embedding").as("vector")),
        path)
      val scan = XvecIO.read(s, path, window = "[0..300)")
        .agg(count(lit(1)).as("n"), min("ordinal").as("mn"), max("ordinal").as("mx"))
      require(scan.queryExecution.executedPlan.toString.contains("aggPushed="),
        "xvec aggregate pushdown did not engage")
      scan
    },

    // NumPy .npy round trip through the same DSv2 (file-headered, headerless
    // records): write the embeddings as a real v1.0 '<f4' C-order npy, read
    // back with an ordinal window (pushdown applies unchanged), norms must
    // match the parquet source. Interop with numpy itself is pinned by
    // NpySpec-independent cross-checks (numpy.save -> our scan; our write ->
    // numpy.load).
    GQuery(
      "q110_npy_roundtrip",
      """SELECT vec_id AS ordinal, len(embedding) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE*x::DOUBLE))), 6) AS norm
        |FROM embeddings WHERE vec_id >= 50 AND vec_id < 250""".stripMargin) { (s, dir) =>
      val path = s"${tmpDir()}/rt-${System.nanoTime()}.npy"
      val src = Tables.embeddings(s, dir)
        .select(col("vec_id").as("ordinal"), col("embedding").as("vector"))
      XvecIO.write(src, path)
      XvecIO.read(s, path, window = "[50..250)")
        .select(col("ordinal"), size(col("vector")).as("dim"),
          round(graft.functions.VectorFunctions.vectorNorm(col("vector")), 6).as("norm"))
    },

    // Slab store: append documents as (doc_id, utf8 bytes), batch multi-get
    // with a miss — submission order preserved, payload decodes back.
    GQuery(
      "q53_slab_multiget",
      """SELECT r.request_idx, r.ordinal, d.text
        |FROM (VALUES (0, 5), (1, 17), (2, 300), (3, 9999)) AS r(request_idx, ordinal)
        |LEFT JOIN documents d ON d.doc_id = r.ordinal""".stripMargin) { (s, dir) =>
      import s.implicits._
      val slab = new SlabTable(s, s"${tmpDir()}/slab-${System.nanoTime()}")
      slab.append("docs", Tables.documents(s, dir)
        .select(col("doc_id").as("ordinal"), encode(col("text"), "UTF-8").as("data")))
      val req = Seq((0L, 5L), (1L, 17L), (2L, 300L), (3L, 9999L)).toDF("request_idx", "ordinal")
      slab.getAll("docs", req)
        .select(col("request_idx"), col("ordinal"), decode(col("data"), "UTF-8").as("text"))
    },

    // Full discovery path (§3.1): dataset.yaml with a sized profile →
    // GraftDataset → windowed facet with logical/physical ordinals. The
    // oracle recomputes the expected slice straight from the parquet table.
    GQuery(
      "q55_dataset_profile",
      """SELECT vec_id AS logical_ordinal, vec_id AS physical_ordinal,
        |       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE*x::DOUBLE))), 6) AS norm
        |FROM embeddings WHERE vec_id < 200""".stripMargin) { (s, dir) =>
      val dsDir = Paths.get(tmpDir(), s"ds-${System.nanoTime()}")
      Files.createDirectories(dsDir)
      XvecIO.write(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("ordinal"), col("embedding").as("vector")),
        s"$dsDir/base.fvec")
      Files.write(dsDir.resolve("dataset.yaml"),
        """attributes:
          |  distance_function: COSINE
          |profiles:
          |  default:
          |    base: base.fvec
          |  sized: ["200"]
          |""".stripMargin.getBytes("UTF-8"))
      graft.layout.GraftDataset.load(s, dsDir.toString)
        .profile("200").facet("base")
        .select(
          col("ordinal").as("logical_ordinal"),
          col("physical_ordinal"),
          round(graft.functions.VectorFunctions.vectorNorm(col("vector")), 6).as("norm"))
    },

    // Merkle leaf hashing (distributed sha2) + one fold level. The oracle
    // recomputes both from the raw text (string-concat fold; the
    // spec-faithful binary fold is pinned by MerkleSpec).
    GQuery(
      "q54_merkle_leaves",
      """WITH leaves AS (
        |  SELECT doc_id AS chunk_idx, lower(sha256(text)) AS hash
        |  FROM documents WHERE doc_id < 64)
        |SELECT chunk_idx // 2 AS node_idx,
        |       lower(sha256(string_agg(hash, '' ORDER BY chunk_idx))) AS hash
        |FROM leaves GROUP BY 1""".stripMargin) { (s, dir) =>
      val leaves = Merkle.leafHashes(
        Tables.documents(s, dir).filter(col("doc_id") < 64)
          .select(col("doc_id").as("chunk_idx"), col("text").as("data")))
      leaves
        .groupBy((col("chunk_idx") / 2).cast("long").as("node_idx"))
        .agg(lower(sha2(concat_ws("",
          sort_array(collect_list(struct(col("chunk_idx"), col("hash")))).getField("hash")), 256))
          .as("hash"))
    },
  )
}
