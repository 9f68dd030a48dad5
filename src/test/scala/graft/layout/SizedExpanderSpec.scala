package graft.layout

import org.scalatest.funsuite.AnyFunSuite

class SizedExpanderSpec extends AnyFunSuite {
  import SizedExpander._

  test("single values and plain ranges") {
    assert(expandSpec("10m") == Seq(SizedEntry("10m", 10000000L)))
    assert(expandSpec("1m..5m") == Seq(SizedEntry("1m", 1000000L), SizedEntry("5m", 5000000L)))
    assert(expandSpec("1000") == Seq(SizedEntry("1k", 1000L)))
  }

  test("linear step (suffix divisor): 100m..400m/100m -> 100,200,300,400m") {
    assert(expandSpec("100m..400m/100m").map(_.name) == Seq("100m", "200m", "300m", "400m"))
    // zero start begins at the step value
    assert(expandSpec("0m..300m/100m").map(_.name) == Seq("100m", "200m", "300m"))
  }

  test("linear count (bare divisor): 0m..400m/4 -> 4 equal divisions") {
    assert(expandSpec("0m..400m/4").map(_.count) ==
      Seq(100000000L, 200000000L, 300000000L, 400000000L))
  }

  test("fibonacci: fib:1m..40m -> 1,1,2,3,5,8,13,21,34 (deduped by expand)") {
    val fib = expandSpec("fib:1m..40m").map(_.count / 1000000L)
    assert(fib == Seq(1, 1, 2, 3, 5, 8, 13, 21, 34))
    assert(expand(Seq("fib:1m..40m")).map(_.count / 1000000L) ==
      Seq(1, 2, 3, 5, 8, 13, 21, 34))
  }

  test("geometric: mul:1m..16m/2 doubles; fractional factor works") {
    assert(expandSpec("mul:1m..16m/2").map(_.count / 1000000L) == Seq(1, 2, 4, 8, 16))
    assert(expandSpec("mul:1000..3000/1.5").map(_.count) == Seq(1000L, 1500L, 2250L))
  }

  test("expand sorts + dedupes across specs") {
    assert(expand(Seq("20m", "10m", "20m")).map(_.name) == Seq("10m", "20m"))
  }

  test("dataset.yaml sized: key expands into windowed profiles") {
    val entry = Catalog.parseDatasetYaml("big",
      """profiles:
        |  default:
        |    base: base.fvec
        |    indices: idx.ivec
        |  sized: [1m, 2m..4m/1m]
        |""".stripMargin)
    assert(entry.profiles.keySet == Set("default", "1m", "2m", "3m", "4m"))
    val p2m = entry.profiles("2m")
    assert(p2m.facets("base_vectors").window.count == 2000000L)
    assert(p2m.facets("neighbor_indices").window.count == 2000000L)
  }
}
