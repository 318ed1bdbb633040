package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the /proc parsing behind Bench's environment-evidence block
  * (round-8 verdict item 2): the contamination detector is only as
  * good as these two reads, so a kernel-format surprise must fail HERE,
  * not silently zero the `contended` flag in a recorded round.
  */
class BenchEnvSpec extends AnyFunSuite {

  test("loadavg1 reads a plausible 1-minute load on this platform") {
    val l = Bench.loadavg1()
    assert(l >= 0.0, s"loadavg unreadable: $l")
    assert(l < 10000.0)
  }

  test("systemBusyJiffies is positive and monotonic across busy work") {
    val a = Bench.systemBusyJiffies()
    assert(a > 0, s"/proc/stat unreadable: $a")
    // burn ~50ms of CPU so the busy counter provably advances
    val t0 = System.nanoTime()
    var x = 0L
    while (System.nanoTime() - t0 < 50e6) x += 1
    assert(x > 0)
    val b = Bench.systemBusyJiffies()
    assert(b >= a, s"busy jiffies went backwards: $a -> $b")
  }
}
