package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CompactionPolicySpec extends AnyFunSuite {

  test("due fires on the last ordinal of each k-window") {
    val p = CompactionPolicy(3)
    assert((0L to 9L).filter(p.due) == Seq(2L, 5L, 8L))
    val every = CompactionPolicy(1)
    assert((0L to 3L).forall(every.due))
    assert(!(0L to 1000L).exists(CompactionPolicy.Never.due))
  }

  test("maybe compacts exactly when due, else passes the index through") {
    val p = CompactionPolicy(2)
    var fired = 0
    val out = (0L to 5L).foldLeft("i") { (idx, ord) =>
      p.maybe(ord, idx) { i => fired += 1; i + "." }
    }
    assert(fired == 3 && out == "i...")
  }

  test("invalid cadence and negative ordinals are rejected") {
    intercept[IllegalArgumentException](CompactionPolicy(0))
    intercept[IllegalArgumentException](CompactionPolicy(-2))
    intercept[IllegalArgumentException](CompactionPolicy(3).due(-1L))
  }
}
