package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType, ShortType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DistanceKernels, F16ToF32, VectorDistance, VectorNorm}

/** The SparkSessionExtensions entry point (SURVEY.md X3/X5): registers the
  * engine's native Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT vector_distance(a, b, 'COSINE') ...")` plans the same
  * codegen'd kernel the Column API uses. Enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or register into an
  * existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorDistance].getName, name), b => builder(b)))
    }
}

object GraftExtensions {

  private def metricId(e: Expression): Int = e match {
    case Literal(s: UTF8String, _) => DistanceKernels.metricId(s.toString)
    case other => throw new IllegalArgumentException(
      s"metric must be a string literal (COSINE|EUCLIDEAN|L1|DOT_PRODUCT), got $other")
  }

  /** name -> expression builder, shared by the extensions path and the
    * existing-session registration path.
    */
  private def asFloatArray(e: Expression): Expression = Cast(e, ArrayType(FloatType))

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_distance" -> { args =>
      require(args.length == 3, "vector_distance(vec, vec, 'METRIC')")
      VectorDistance(asFloatArray(args(0)), asFloatArray(args(1)), metricId(args(2)))
    },
    "vector_norm" -> { args =>
      require(args.length == 1, "vector_norm(vec)")
      VectorNorm(asFloatArray(args(0)))
    },
    "f16_to_f32" -> { args =>
      require(args.length == 1, "f16_to_f32(short)")
      F16ToF32(Cast(args(0), ShortType))
    },
    // X4: the bounded-heap aggregate — the analyzer wraps the returned
    // AggregateFunction, so GROUP BY queries plan the same map-side partial
    // top-k the Column API uses
    "topk_pairs" -> { args =>
      require(args.length == 3, "topk_pairs(dist, id, k)")
      val k = args(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"k must be an integer literal, got $other")
      }
      graft.functions.TopKPairs(
        Cast(args(0), org.apache.spark.sql.types.DoubleType),
        Cast(args(1), org.apache.spark.sql.types.LongType), k)
    })

  /** Register all functions into an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
