package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: `ExpressionUtils.column/expression` are
  * `private[sql]` in Spark 4, so Column <-> Catalyst Expression conversion for
  * our native expressions (distance kernels, top-k aggregate, f16 decode) must
  * be re-exported from inside the `org.apache.spark.sql` namespace. This is
  * the only file that lives outside the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an `RDD[InternalRow]` as a DataFrame WITHOUT the external-Row
    * round trip (`createDataFrame(RDD[Row])` plans a RowEncoder
    * serialization boundary; this stays columnar-compatible and keeps
    * downstream operators inside whole-stage codegen). `private[sql]` in
    * Spark 4's classic session, hence bridged here. Rows may be reused
    * buffers: the planner's scan applies its own copying projection per
    * row, the pipelined-consumption contract of every InternalRow RDD.
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Register a SQL function into an EXISTING session's registry
    * (`sessionState` is `private[sql]`) — the ad-hoc path; new sessions
    * should use `spark.sql.extensions=graft.GraftExtensions` instead.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
