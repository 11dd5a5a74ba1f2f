package graft.util

import org.scalatest.funsuite.AnyFunSuite

class ParallelSpec extends AnyFunSuite {

  test("preserves input order regardless of completion order") {
    val out = Parallel.map(1 to 50, 8) { i =>
      if (i % 7 == 0) Thread.sleep(5)
      i * 2
    }
    assert(out == (1 to 50).map(_ * 2).toVector)
  }

  test("propagates the first failure") {
    val e = intercept[Exception] {
      Parallel.map(1 to 10, 4) { i =>
        if (i == 5) throw new IllegalStateException("boom")
        i
      }
    }
    assert(e.getMessage != null && e.getMessage.contains("boom") ||
      e.getCause != null && e.getCause.getMessage.contains("boom"))
  }

  test("runs inline for single-item and single-thread inputs") {
    assert(Parallel.map(Seq(7), 16)(_ + 1) == Vector(8))
    assert(Parallel.map(1 to 3, 1)(_ + 1) == Vector(2, 3, 4))
    assert(Parallel.map(Seq.empty[Int], 4)(_ + 1).isEmpty)
  }
}
