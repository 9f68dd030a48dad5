package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Merkle-tree integrity verification as aggregation jobs (SURVEY.md
  * A12/A13; reference docs/specs/merkle_v1.md:14-90, merklev2/
  * MerkleRefFactory.java, MerkleShape.java).
  *
  * Geometry per spec: auto-sized chunks (1MB..64MB, <=4096 leaves; tiny
  * content uses 64B or next-pow2 chunks), complete binary tree padded to a
  * power-of-2 leaf capacity, flat array indexing (children 2i+1 / 2i+2),
  * SHA-256 leaves over raw chunk bytes, internal = SHA-256(L || R), padding
  * leaves = SHA-256 over 32 zero bytes.
  *
  * Spark shape: leaf hashing is distributed (chunk DataFrame → sha2);
  * the tree fold is log2(leaves) rounds of groupBy(i/2) — at the spec
  * maximum of 4096 leaves the fold is trivially cheap, so it can also run
  * driver-side via `buildFromLeafHashes`.
  */
object Merkle {

  final case class Shape(contentSize: Long, chunkSize: Long, chunkCount: Int,
      capLeaf: Int, nodeCount: Int, offset: Int)

  /** Chunk sizing per merkle_v1.md:14-31. */
  def shapeFor(contentSize: Long): Shape = {
    val chunkSize: Long =
      if (contentSize < 1024L) 64L
      else if (contentSize < (1L << 20)) {
        var cs = 1024L
        while (cs < contentSize) cs *= 2
        cs
      } else {
        var cs = 1L << 20
        while (ceilDiv(contentSize, cs) > 4096 && cs < (64L << 20)) cs *= 2
        cs
      }
    val chunkCount = ceilDiv(contentSize, chunkSize).toInt
    var capLeaf = 1
    while (capLeaf < chunkCount) capLeaf *= 2
    Shape(contentSize, chunkSize, chunkCount, capLeaf, 2 * capLeaf - 1, capLeaf - 1)
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  private def sha256(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  private val zeroLeafHash: Array[Byte] = sha256(new Array[Byte](32))

  /** Distributed leaf hashing: (chunk_idx, data) → (chunk_idx, hash hex). */
  def leafHashes(chunks: DataFrame, idxCol: String = "chunk_idx",
      dataCol: String = "data"): DataFrame =
    chunks.select(col(idxCol).cast("int").as("chunk_idx"),
      lower(sha2(col(dataCol), 256)).as("hash"))

  /** Full flat tree (hex strings, length nodeCount) from collected leaf
    * hashes — <=4096 × 32B by spec, safely driver-side.
    */
  def buildFromLeafHashes(leaves: Seq[(Int, String)], shape: Shape): Vector[String] = {
    val nodes = new Array[Array[Byte]](shape.nodeCount)
    val leafMap = leaves.toMap
    (0 until shape.capLeaf).foreach { i =>
      nodes(shape.offset + i) = leafMap.get(i)
        .map(hexToBytes)
        .getOrElse(zeroLeafHash)
    }
    (shape.offset - 1) to 0 by -1 foreach { i =>
      nodes(i) = sha256(nodes(2 * i + 1) ++ nodes(2 * i + 2))
    }
    nodes.map(bytesToHex).toVector
  }

  /** End-to-end: chunk DataFrame → root hash + full tree. */
  def buildTree(chunks: DataFrame, shape: Shape): Vector[String] = {
    val leaves = leafHashes(chunks).collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    require(leaves.size == shape.chunkCount,
      s"expected ${shape.chunkCount} chunks, got ${leaves.size}")
    buildFromLeafHashes(leaves, shape)
  }

  def rootOf(tree: Vector[String]): String = tree.head

  /** A13 verify/diff: compare two leaf-hash DataFrames → mismatched chunk
    * indices (the prebuffer/verify work queue).
    */
  def diffLeaves(a: DataFrame, b: DataFrame): DataFrame =
    a.toDF("chunk_idx", "hash_a")
      .join(b.toDF("chunk_idx", "hash_b"), Seq("chunk_idx"), "full")
      .filter(!(col("hash_a") <=> col("hash_b")))
      .orderBy("chunk_idx")

  /** Chunk a local file into a (chunk_idx, data) DataFrame per the shape —
    * executors read disjoint byte ranges (the distributed analogue of
    * MAFileChannel chunk access).
    */
  def chunkFile(spark: SparkSession, path: String): (Shape, DataFrame) = {
    val size = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    val shape = shapeFor(size)
    import spark.implicits._
    val idx = spark.range(0, shape.chunkCount).toDF("chunk_idx")
    val df = idx.as[Long].mapPartitions { it =>
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(path), java.nio.file.StandardOpenOption.READ)
      it.map { i =>
        val start = i * shape.chunkSize
        val len = math.min(shape.chunkSize, size - start).toInt
        val buf = java.nio.ByteBuffer.allocate(len)
        var read = 0
        while (read < len) {
          val r = ch.read(buf, start + read)
          require(r > 0, s"$path: unexpected EOF at ${start + read}")
          read += r
        }
        (i, buf.array())
      }
    }.toDF("chunk_idx", "data")
    (shape, df)
  }

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def bytesToHex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString
}
