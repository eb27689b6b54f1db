package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r21 shape of the streaming drain's state-partition formula
  * (`ceil(srcBytes / 1 MB)` floored at 1, capped at
  * `max(cores × 4, 4096)`): the r20 formula had NO upper bound, so a
  * 100 TB drained source would have asked for millions of state-store
  * instances — far past practical task-launch overhead and per-batch
  * store load/commit cost. Arithmetic-only: no Spark session needed.
  */
class StatePartitionsSpec extends AnyFunSuite {

  private val MB = 1024L * 1024

  test("KB drains stay at one state store (the floor)") {
    assert(EventWindows.statePartitions(0L, 32) == 1L)
    assert(EventWindows.statePartitions(12 * 1024L, 32) == 1L)
    assert(EventWindows.statePartitions(MB, 32) == 1L)
  }

  test("MB-to-GB drains grow with data, one store per MB up to the cap") {
    assert(EventWindows.statePartitions(MB + 1, 32) == 2L)
    assert(EventWindows.statePartitions(11 * MB, 32) == 11L)
    assert(EventWindows.statePartitions(100 * MB, 32) == 100L)
    // 32-core session: cap = max(32*4, 4096) = 4096, reached at 4 GB
    assert(EventWindows.statePartitions(4096L * MB, 32) == 4096L)
    assert(EventWindows.statePartitions(10L * 1024 * MB, 32) == 4096L)
  }

  test("100 TB drains hit the cap, not 100M instances") {
    val tb100 = 100L * 1024 * 1024 * MB
    // uncapped the formula would ask for ~100M partitions
    assert(tb100 / MB > 100_000_000L)
    assert(EventWindows.statePartitions(tb100, 32) == 4096L)
    // a 2048-core cluster: cap = 8192 — the cap scales with parallelism
    assert(EventWindows.statePartitions(tb100, 2048) == 8192L)
  }

  test("the cap never pushes small drains UP") {
    // max(cores*4, 4096) is only a ceiling: a 1-byte drain on a huge
    // cluster still gets one store
    assert(EventWindows.statePartitions(1L, 2048) == 1L)
  }
}
