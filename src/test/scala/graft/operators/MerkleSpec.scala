package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

class MerkleSpec extends SparkSpec {
  import spark.implicits._

  private def sha(b: Array[Byte]) =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  test("shape sizing follows merkle_v1.md rules") {
    assert(Merkle.shapeFor(100).chunkSize == 64)
    assert(Merkle.shapeFor(100 * 1024).chunkSize == 128 * 1024) // next pow2 >= content
    assert(Merkle.shapeFor(10L << 20).chunkSize == 1L << 20)    // 1MB default
    // >4096MB at 1MB chunks -> chunk doubles until <=4096 leaves
    val big = Merkle.shapeFor(5000L << 20)
    assert(big.chunkSize == 2L << 20 && big.chunkCount <= 4096)
    val s = Merkle.shapeFor(300)
    assert(s.chunkCount == 5 && s.capLeaf == 8 && s.nodeCount == 15 && s.offset == 7)
  }

  test("tree construction: leaves, padding, internal concatenation") {
    val chunks = Seq((0, "aaaa".getBytes), (1, "bbbb".getBytes), (2, "cc".getBytes))
      .toDF("chunk_idx", "data")
    val shape = Merkle.Shape(10, 4, 3, 4, 7, 3)
    val tree = Merkle.buildTree(chunks, shape)
    assert(tree.size == 7)
    assert(tree(3) == sha("aaaa".getBytes))
    assert(tree(4) == sha("bbbb".getBytes))
    assert(tree(5) == sha("cc".getBytes))
    assert(tree(6) == sha(new Array[Byte](32))) // padding leaf = sha(32 zeros)
    def un(hex: String) = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(tree(1) == sha(un(tree(3)) ++ un(tree(4))))
    assert(tree(0) == sha(un(tree(1)) ++ un(tree(2))))
  }

  test("identical content -> identical root; one flipped byte -> diff localizes the chunk") {
    val a = (0 until 8).map(i => (i, Array.fill(16)(i.toByte))).toDF("chunk_idx", "data")
    val b = (0 until 8).map(i => (i, {
      val arr = Array.fill(16)(i.toByte); if (i == 5) arr(3) = 99; arr
    })).toDF("chunk_idx", "data")
    val shape = Merkle.Shape(128, 16, 8, 8, 15, 7)
    assert(Merkle.rootOf(Merkle.buildTree(a, shape)) ==
      Merkle.rootOf(Merkle.buildTree(a, shape)))
    assert(Merkle.rootOf(Merkle.buildTree(a, shape)) !=
      Merkle.rootOf(Merkle.buildTree(b, shape)))
    val diff = Merkle.diffLeaves(Merkle.leafHashes(a), Merkle.leafHashes(b)).collect()
    assert(diff.map(_.getInt(0)).toSeq == Seq(5))
  }

  test("chunkFile + tree over a real file") {
    val p = java.nio.file.Paths.get("target", "tmp-merkle.bin")
    java.nio.file.Files.createDirectories(p.getParent)
    val content = Array.tabulate(5000)(i => (i % 251).toByte)
    java.nio.file.Files.write(p, content)
    val (shape, chunks) = Merkle.chunkFile(spark, p.toString)
    assert(shape.chunkSize == 8192 && shape.chunkCount == 1)
    val tree = Merkle.buildTree(chunks, shape)
    assert(Merkle.rootOf(tree) == sha(content))
  }
}
