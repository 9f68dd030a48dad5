package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseXor, Cast, Expression, ExpressionInfo, Literal, Subtract}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharEntropy, DistanceKernels, F16ToF32, PolyHash60, TopKPairs, VectorDistance, VectorFunctions, VectorNorm}

/** The SparkSessionExtensions entry point (SURVEY.md X3/X4/X5): registers
  * the engine's native Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT vector_distance(a, b, 'COSINE') ...")` plans the same
  * codegen'd kernel the Column API uses. Enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or register into an
  * existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, className, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(className, name), b => builder(b)))
    }
}

object GraftExtensions {

  private def metricId(e: Expression): Int = e match {
    case Literal(s: UTF8String, _) => DistanceKernels.metricId(s.toString)
    case other => throw new IllegalArgumentException(
      s"metric must be a string literal (COSINE|EUCLIDEAN|L1|DOT_PRODUCT), got $other")
  }

  private def asFloatArray(e: Expression): Expression =
    VectorFunctions.asFloatArrayExpr(e)

  // f16 bit-pattern normalization is defined ONCE in VectorFunctions
  // (asF16BitsExpr) and shared with the Column API
  private def asF16Bits(e: Expression): Expression =
    VectorFunctions.asF16BitsExpr(e)

  /** (name, implementing class, expression builder) — shared by the
    * extensions path and the existing-session registration path.
    */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vector_distance", classOf[VectorDistance].getName, { args: Seq[Expression] =>
      require(args.length == 3, "vector_distance(vec, vec, 'METRIC')")
      VectorDistance(asFloatArray(args(0)), asFloatArray(args(1)), metricId(args(2)))
    }),
    ("vector_norm", classOf[VectorNorm].getName, { args: Seq[Expression] =>
      require(args.length == 1, "vector_norm(vec)")
      VectorNorm(asFloatArray(args(0)))
    }),
    ("f16_to_f32", classOf[F16ToF32].getName, { args: Seq[Expression] =>
      require(args.length == 1, "f16_to_f32(bits)")
      F16ToF32(asF16Bits(args(0)))
    }),
    ("char_entropy", classOf[CharEntropy].getName, { args: Seq[Expression] =>
      require(args.length == 1, "char_entropy(text)")
      CharEntropy(Cast(args(0), StringType))
    }),
    ("poly_hash60", classOf[PolyHash60].getName, { args: Seq[Expression] =>
      require(args.length == 1, "poly_hash60(text)")
      PolyHash60(Cast(args(0), StringType))
    }),
    // X4: the bounded-heap aggregate — the analyzer wraps the returned
    // AggregateFunction, so GROUP BY queries plan the same map-side partial
    // top-k the Column API uses
    ("topk_pairs", classOf[TopKPairs].getName, { args: Seq[Expression] =>
      require(args.length == 3, "topk_pairs(dist, id, k)")
      val k = args(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"k must be an integer literal, got $other")
      }
      TopKPairs(Cast(args(0), DoubleType), Cast(args(1), LongType), k)
    }))

  /** Register all functions into an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
