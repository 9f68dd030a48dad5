package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight distance kernels over Spark's ArrayData, called from both the
  * interpreted path and generated code (static forwarders keep these inside
  * whole-stage codegen — no boxing, no per-element virtual dispatch beyond
  * ArrayData accessors).
  *
  * Distance semantics follow the reference's DistanceFunction
  * (/root/reference/datatools-testdata-apis/.../types/DistanceFunction.java:22-101):
  * all metrics are lower-is-better distances; COSINE = 1 - cosine similarity;
  * DOT_PRODUCT = -dot(a,b) (the reference's deliberate sign flip,
  * DistanceFunction.java:26-27,133-135). Accumulation in f64.
  */
object DistanceKernels {
  final val COSINE = 0
  final val EUCLIDEAN = 1
  final val L1 = 2
  final val DOT_PRODUCT = 3

  def metricId(name: String): Int = name.toUpperCase match {
    case "COSINE"                     => COSINE
    case "EUCLIDEAN" | "L2"           => EUCLIDEAN
    case "L1" | "MANHATTAN"           => L1
    case "DOT_PRODUCT" | "DOT" | "IP" => DOT_PRODUCT
    case other => throw new IllegalArgumentException(s"unknown distance metric: $other")
  }

  private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      // fail-fast dim validation, mirroring the reference's uniform-dimension
      // constraint (docs/specs/dataset_yaml_v1.md:106-113)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.numElements()} vs ${b.numElements()}")
    }
    n
  }

  def compute(a: ArrayData, b: ArrayData, metric: Int): Double = metric match {
    case COSINE      => cosine(a, b)
    case EUCLIDEAN   => euclidean(a, b)
    case L1          => l1(a, b)
    case DOT_PRODUCT => negDot(a, b)
    case m           => throw new IllegalArgumentException(s"unknown metric id: $m")
  }

  /** Plain float-array form for typed kernels (zero-copy path for
    * Dataset.map operators like ivfIndex). Accumulation order is identical
    * to the ArrayData loops, so results are bit-equal across both forms.
    */
  def computeArrays(a: Array[Float], b: Array[Float], metric: Int): Double = {
    val n = a.length
    if (n != b.length) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs ${b.length}")
    }
    metric match {
      case COSINE =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      case EUCLIDEAN =>
        var s = 0.0; var i = 0
        while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
        math.sqrt(s)
      case L1 =>
        var s = 0.0; var i = 0
        while (i < n) { s += math.abs(a(i).toDouble - b(i).toDouble); i += 1 }
        s
      case DOT_PRODUCT =>
        var s = 0.0; var i = 0
        while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        -s
      case m => throw new IllegalArgumentException(s"unknown metric id: $m")
    }
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def euclidean(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  def l1(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  def negDot(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    -s
  }

  /** L2 norm of a single vector (f64 accumulation). */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }
}
