package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge cases for the training-sequence prep operators (the common path is
  * oracled by q106/q107).
  */
class TextChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens: window arithmetic, overlap, tail clipping") {
    // 50 tokens, windows of 32 at stride 24: chunks start at 0 and 24
    val text = (0 until 50).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val out = TextFunctions.chunkByTokens(df, "id", "text", 32, 8)
      .orderBy("chunk_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("n_tokens") == 32)
    assert(out(1).getAs[Int]("n_tokens") == 26) // tokens [24, 50)
    val c0 = out(0).getAs[String]("chunk").split(" ")
    val c1 = out(1).getAs[String]("chunk").split(" ")
    assert(c0.head == "w0" && c0.last == "w31")
    assert(c1.head == "w24" && c1.last == "w49") // 8-token overlap w24..w31
    // short doc: one chunk, all tokens; empty doc: no chunks
    val shorts = TextFunctions.chunkByTokens(
      Seq((1L, "a b c"), (2L, "   "), (3L, "")).toDF("id", "text"),
      "id", "text", 32, 8).collect()
    assert(shorts.map(r => (r.getLong(0), r.getAs[Int]("n_tokens"))).toSeq ==
      Seq((1L, 3)))
    intercept[IllegalArgumentException](
      TextFunctions.chunkByTokens(df, "id", "text", 32, 32))
  }

  test("gopherFlags: each rule trips on its own degenerate input") {
    val prose = ((0 until 60).map(i => s"word$i") ++
      Seq("the", "and", "of", "to")).mkString(" ")
    val df = Seq(
      (1L, prose),                                  // passes everything
      (2L, "too short to pass the word count"),     // word_count_ok = false
      (3L, prose + " " + Seq.fill(20)("###### ......").mkString(" ")), // symbols
      (4L, ((0 until 60).map(_.toString) ++ Seq("the", "and")).mkString(" "))) // digits: alpha_ok false
      .toDF("id", "text")
    val f = TextFunctions.gopherFlags(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getAs[Boolean]("passes"))
    assert(!f(2L).getAs[Boolean]("word_count_ok") && !f(2L).getAs[Boolean]("passes"))
    assert(!f(3L).getAs[Boolean]("symbol_ok"))
    assert(!f(4L).getAs[Boolean]("alpha_ok"))
    assert(f(1L).getAs[Boolean]("stop_ok")) // the/and/of/to >= 2 distinct
  }

  test("gopherFlags treats null text as an empty doc, not size(null) = -1") {
    val f = TextFunctions.gopherFlags(
      Seq((1L, null.asInstanceOf[String])).toDF("id", "text"), "id", "text")
      .collect().head
    assert(f.getAs[Int]("n_words") == 0)
    assert(!f.getAs[Boolean]("word_count_ok") && !f.getAs[Boolean]("passes"))
  }

  test("charEntropy: degenerate 0, uniform ln(k), null/empty 0, pure projection") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select(col("id"), TextFunctions.charEntropy(col("text")).as("h"))
    val m = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 0.0 && m(4L) == 0.0 && m(5L) == 0.0)
    assert(m(2L) == math.rint(math.log(2) * 1e6) / 1e6)
    assert(m(3L) == math.rint(math.log(4) * 1e6) / 1e6)
    // the signal must stay a shuffle-free projection (streaming-composable)
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
