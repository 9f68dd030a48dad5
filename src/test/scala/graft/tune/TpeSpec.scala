package graft.tune

import org.scalatest.funsuite.AnyFunSuite

/** TPE sampler contracts: the documented gamma/weight formulas, seeded
  * determinism, exploitation of a peaked objective (beats random search
  * head-to-head on trials-to-optimum), duplicate avoidance, and clean
  * exhaustion of small spaces.
  */
class TpeSpec extends AnyFunSuite {

  private val space: Seq[(String, Vector[String])] = Seq(
    "a" -> Vector("1", "2", "3", "4"),
    "b" -> Vector("x", "y", "z", "w"),
    "c" -> Vector("p", "q", "r", "s"))

  // peaked separable objective, maximum 3.0 at (a=3, b=y, c=r)
  private def objective(p: Map[String, String]): Double =
    (if (p("a") == "3") 1.0 else 0.0) +
      (if (p("b") == "y") 1.0 else 0.0) +
      (if (p("c") == "r") 1.0 else 0.0)

  test("gamma and weight formulas match the documented defaults") {
    assert(TpeSampler.defaultGamma(10) == 1)
    assert(TpeSampler.defaultGamma(100) == 10)
    assert(TpeSampler.defaultGamma(1000) == 25)
    assert(TpeSampler.defaultWeights(10).toSeq == Seq.fill(10)(1.0))
    val w30 = TpeSampler.defaultWeights(30)
    assert(w30.length == 30)
    assert(w30.take(5).toSeq == w30.take(5).sorted.toSeq, "ramp ascends")
    assert(math.abs(w30(0) - 1.0 / 30) < 1e-12)
    assert(w30.drop(5).forall(_ == 1.0), "newest 25 carry full weight")
  }

  test("finds the optimum of the peaked objective within 40 trials") {
    val s = TpeSampler.optimize(space, objective, maxTrials = 40, seed = 7L)
    assert(s.bestTrial.get.score == 3.0,
      s"best ${s.bestTrial.get} after ${s.trialCount} trials")
  }

  test("beats seeded random search on trials-to-optimum, averaged over seeds") {
    def trialsToOpt(seed: Long, tpe: Boolean): Int = {
      if (tpe) {
        val s = new TpeSampler(space, seed)
        var t = 0
        while (t < 64) {
          val p = s.suggest().get
          s.addTrial(p, objective(p))
          t += 1
          if (objective(p) == 3.0) return t
        }
        64
      } else {
        val rng = new scala.util.Random(seed)
        var t = 0
        while (t < 64) {
          val p = space.map { case (n, vs) => n -> vs(rng.nextInt(vs.size)) }.toMap
          t += 1
          if (objective(p) == 3.0) return t
        }
        64
      }
    }
    val seeds = (1L to 8L)
    val tpeMean = seeds.map(trialsToOpt(_, tpe = true)).sum / 8.0
    val rndMean = seeds.map(trialsToOpt(_, tpe = false)).sum / 8.0
    assert(tpeMean < rndMean,
      s"TPE ($tpeMean trials) should reach the optimum before random ($rndMean)")
  }

  test("suggestions are deterministic under a seed and never duplicate history") {
    def run(seed: Long): Seq[Map[String, String]] = {
      val s = new TpeSampler(space, seed)
      (0 until 20).map { _ =>
        val p = s.suggest().get
        s.addTrial(p, objective(p))
        p
      }
    }
    assert(run(11L) == run(11L), "same seed, same trajectory")
    val seen = run(11L)
    assert(seen.distinct.size == seen.size, "no duplicate suggestions")
  }

  test("a tiny space exhausts cleanly to None") {
    val s = new TpeSampler(Seq("a" -> Vector("1", "2")), seed = 3L, nStartup = 1)
    val got = Iterator.continually(s.suggest()).takeWhile(_.isDefined)
      .map(_.get).take(4).toSeq
    got.foreach(p => s.addTrial(p, 0.0))
    assert(got.toSet == Set(Map("a" -> "1"), Map("a" -> "2")))
    assert(s.suggest().isEmpty, "explored space must yield None")
  }

  test("good-group modeling concentrates later suggestions near the seeds") {
    val s = new TpeSampler(space, seed = 5L, nStartup = 0, nCandidates = 24)
    // plant history: value a=3 always scores high, others low
    for (i <- 0 until 30) {
      val a = (i % 4 + 1).toString
      val p = Map("a" -> a, "b" -> Vector("x", "y", "z", "w")(i % 4),
        "c" -> Vector("p", "q", "r", "s")((i / 4) % 4))
      s.addTrial(p, if (a == "3") 10.0 else i * 0.01)
    }
    val picks = (0 until 20).flatMap(_ => s.suggest()).map(_("a"))
    val frac3 = picks.count(_ == "3").toDouble / picks.size
    assert(frac3 > 0.5, s"good-group value should dominate suggestions: $frac3")
  }
}
