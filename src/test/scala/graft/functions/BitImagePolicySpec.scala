package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prebuffer
import graft.predicates.{Comparand, ConjugateNode, OpType, PNodeSql, PredicateNode}

class BitImagePolicySpec extends AnyFunSuite {

  test("braille rendering: known masks") {
    // 8 set bits = full cell U+28FF; none = blank braille U+2800
    assert(BitImage.render(8, _ => true) == "⣿")
    assert(BitImage.render(8, _ => false) == "⠀")
    // dot 1 only (bit 0) = U+2801
    assert(BitImage.render(1, _ == 0) == "⠁")
    // 16 bits -> 2 cells
    assert(BitImage.render(16, _ < 8) == "⣿⠀")
    assert(BitImage.summary(4, _ < 2).endsWith("2/4 (50.0%)"))
  }

  test("chunk run coalescing respects gaps and max run length") {
    assert(Prebuffer.coalesceRuns(Seq(0, 1, 2, 5, 6, 9), maxRun = 4) ==
      Seq((0, 2), (5, 6), (9, 9)))
    assert(Prebuffer.coalesceRuns(Seq(0, 1, 2, 3, 4), maxRun = 2) ==
      Seq((0, 1), (2, 3), (4, 4)))
    assert(Prebuffer.coalesceRuns(Nil, 4) == Nil)
    // Conservative = singleton runs
    assert(Prebuffer.coalesceRuns(Seq(3, 4, 5), maxRun = 1) == Seq((3, 3), (4, 4), (5, 5)))
  }

  test("CDDL rendering shapes (P8)") {
    val tree = ConjugateNode.and(
      PredicateNode.namedTyped("age", OpType.GE, Comparand.IntVal(18)),
      PredicateNode.namedTyped("name", OpType.MATCHES, Comparand.TextVal("A.*")))
    val out = PNodeSql.cddl(tree)
    assert(out.contains("all-of"))
    assert(out.contains("age: number .ge 18"))
    assert(out.contains("name: text .regexp 'A.*'"))
  }
}
