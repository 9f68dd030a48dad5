package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SQL-surface registration of the native expressions: spark.sql text must
  * plan the same codegen'd kernels as the Column API.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit = GraftExtensions.register(spark)

  private lazy val vecs = (0L until 20L).map { i =>
    (i, Array.tabulate(8)(j =>
      ((graft.functions.StableHash.fnv64(s"x:$i:$j") >>> 12).toDouble / (1L << 52) * 2 - 1).toFloat).toSeq)
  }.toDF("vec_id", "embedding")

  test("vector_distance from SQL equals the Column API for every metric") {
    registered
    vecs.createOrReplaceTempView("ext_vecs")
    for (metric <- Seq("COSINE", "EUCLIDEAN", "L1", "DOT_PRODUCT")) {
      val sql = spark.sql(
        s"""SELECT a.vec_id, b.vec_id, vector_distance(a.embedding, b.embedding, '$metric') AS d
           |FROM ext_vecs a JOIN ext_vecs b ON a.vec_id < b.vec_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val api = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          VectorFunctions.distance(col("a.embedding"), col("b.embedding"), metric).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(sql == api, metric)
    }
  }

  test("vector_norm and f16_to_f32 from SQL") {
    registered
    vecs.createOrReplaceTempView("ext_vecs")
    val n = spark.sql("SELECT vec_id, vector_norm(embedding) AS n FROM ext_vecs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val api = vecs.select(col("vec_id"), VectorFunctions.vectorNorm(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(n == api)
    // 0x3C00 is 1.0 in binary16; 0xBC00 (an int the raw short can't hold
    // under ANSI cast) is -1.0 — the 16-bit mask must accept both, on BOTH
    // surfaces, and anything beyond 16 bits must error, not wrap
    assert(spark.sql("SELECT f16_to_f32(15360)").collect()(0).getFloat(0) == 1.0f)
    assert(spark.sql("SELECT f16_to_f32(48128)").collect()(0).getFloat(0) == -1.0f)
    assert(spark.range(1).select(VectorFunctions.f16ToF32(lit(48128)))
      .collect()(0).getFloat(0) == -1.0f)
    // char_entropy: SQL surface == Column API == closed form ln(2)
    assert(spark.sql("SELECT char_entropy('abab')").collect()(0).getDouble(0) ==
      math.rint(math.log(2) * 1e6) / 1e6)
    // poly_hash60: SQL surface == the typed kernel
    assert(spark.sql("SELECT poly_hash60('the cat sat')").collect()(0).getLong(0) ==
      graft.functions.PolyHash.hash60("the cat sat"))
    val oob = intercept[Exception](spark.sql("SELECT f16_to_f32(65536)").collect())
    assert(oob.getMessage.contains("out of range"))
  }

  test("topk_pairs aggregate from SQL matches the Column API KNN tail") {
    registered
    vecs.createOrReplaceTempView("ext_vecs")
    val sql = spark.sql(
      """SELECT a.vec_id AS qid,
        |       topk_pairs(vector_distance(a.embedding, b.embedding, 'EUCLIDEAN'),
        |                  b.vec_id, 3) AS topk
        |FROM ext_vecs a JOIN ext_vecs b ON a.vec_id != b.vec_id
        |WHERE a.vec_id < 4 GROUP BY a.vec_id""".stripMargin)
      .selectExpr("qid", "transform(topk, p -> p.id) AS ids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val api = operators.Knn.knn(
        vecs.filter(col("vec_id") < 4), vecs, k = 3,
        metric = "EUCLIDEAN", excludeSelf = true)
      .groupBy("query_id").agg(collect_list(struct(col("rank"), col("neighbor_id"))).as("l"))
      .select(col("query_id"),
        expr("transform(array_sort(l), p -> p.neighbor_id) AS ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sql == api)
  }

  test("non-literal metric argument fails with a clear message") {
    registered
    vecs.createOrReplaceTempView("ext_vecs")
    val e = intercept[Exception] {
      spark.sql("SELECT vector_distance(embedding, embedding, vec_id) FROM ext_vecs").collect()
    }
    assert(e.getMessage.contains("string literal") || e.getMessage.contains("metric"))
  }

  test("GraftExtensions class wires every builder through injectFunction") {
    // the extensions entry point is only consumed by a fresh session
    // builder at deployment (spark.sql.extensions); pin that applying the
    // class is clean AND that every one of the 4 builders produces the
    // right expression type when invoked (the registry invokes them the
    // same way)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val vec = Literal.create(Seq(1.0f, 2.0f),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val byName = GraftExtensions.builders.map(b => b._1 -> b._3).toMap
    assert(byName("vector_distance")(Seq(vec, vec, Literal("COSINE")))
      .isInstanceOf[graft.functions.VectorDistance])
    assert(byName("vector_norm")(Seq(vec)).find {
      case _: graft.functions.VectorNorm => true; case _ => false
    }.isDefined)
    assert(byName("f16_to_f32")(Seq(Literal(15360))).find {
      case _: graft.functions.F16ToF32 => true; case _ => false
    }.isDefined)
    assert(byName("topk_pairs")(Seq(Literal(1.0), Literal(1L), Literal(3)))
      .isInstanceOf[graft.functions.TopKPairs])
    assert(byName("char_entropy")(Seq(Literal("aaab"))).find {
      case _: graft.functions.CharEntropy => true; case _ => false
    }.isDefined)
    // class metadata points at each function's own implementation
    assert(GraftExtensions.builders.map(_._2).distinct.length == 6)
  }
}
