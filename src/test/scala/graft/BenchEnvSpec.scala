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

  test("readBaseline carries env.ncpus for the comparability guard") {
    // round-17 close lesson: a baseline captured at a different
    // parallelism has legitimately different task counts, and the
    // drift verdict must refuse it rather than report "code-change"
    val f = java.nio.file.Files.createTempFile("bench_baseline", ".json")
    java.nio.file.Files.writeString(f,
      """{"queries":{"q_a":1.5},"cpu":{"q_a":2.0},""" +
        """"exec":{"q_a":{"n_tasks":8,"shuffle_write_bytes":100}},""" +
        """"env":{"ncpus":8}}""")
    val b = Bench.readBaseline(f.toString)
    assert(b.exists(_.ncpus.contains(8)))
    assert(b.exists(_.wall("q_a") == 1.5))
    // a pre-round-17 record without the env block parses with None
    java.nio.file.Files.writeString(f, """{"queries":{"q_a":1.0}}""")
    assert(Bench.readBaseline(f.toString).exists(_.ncpus.isEmpty))
    java.nio.file.Files.delete(f)
  }

  test("driftVerdict refuses a baseline captured at different ncpus") {
    val base = Bench.BaselineDetail(
      wall = Map("q_a" -> 1.0), cpu = Map("q_a" -> 2.0),
      exec = Map("q_a" -> Map("n_tasks" -> 8L, "shuffle_write_bytes" -> 100L)),
      ncpus = Some(8))
    val run = Map("q_a" -> 1.3)
    val rc = Map("q_a" -> 2.3)
    val re = Map("q_a" -> Map("n_tasks" -> 32L, "shuffle_write_bytes" -> 90L))
    val refused = Bench.driftVerdict("b.json", base, run, rc, re, 32)
    assert(refused.contains("baseline-incomparable") &&
      refused.contains("\"baseline_ncpus\":8") &&
      refused.contains("\"run_ncpus\":32"), refused)
    // same ncpus: the comparison proceeds (here: work changed)
    val judged = Bench.driftVerdict("b.json", base, run, rc, re, 8)
    assert(judged.contains("\"verdict\":\"code-change\""), judged)
    // a pre-round-17 baseline (no ncpus) stays comparable
    val legacy = Bench.driftVerdict("b.json", base.copy(ncpus = None),
      run, rc, re, 32)
    assert(!legacy.contains("baseline-incomparable"), legacy)
  }

  test("driftVerdict JSON survives a hostile baseline path") {
    // ADVICE r17: an unescaped quote/backslash in the interpolated
    // path produced invalid JSON inside BENCH_DETAIL.json
    val base = Bench.BaselineDetail(
      wall = Map("q_a" -> 1.0), cpu = Map("q_a" -> 2.0),
      exec = Map("q_a" ->
        Map("n_tasks" -> 8L, "shuffle_write_bytes" -> 100L)))
    val hostile = """weird"na\me.json"""
    val out = Bench.driftVerdict(hostile, base, Map("q_a" -> 1.0),
      Map("q_a" -> 2.0),
      Map("q_a" -> Map("n_tasks" -> 8L, "shuffle_write_bytes" -> 100L)),
      32)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(out) // must parse
    assert(node.get("baseline").asText() === hostile)
  }

  test("defaultBaseline picks the newest env-matched quiesced record") {
    // round-17 ask 6: the drift default must be the decision-grade
    // quiesced anchor, not whatever BENCH_DETAIL.json was last written
    val dir = java.nio.file.Files.createTempDirectory("bench_base").toFile
    def put(name: String, ncpus: Int, quiesced: Boolean): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(dir, name).toPath,
        s"""{"queries":{"q":1.0},"env":{"ncpus":$ncpus,""" +
          s""""quiesced_at_start":$quiesced}}""")
    put("BENCH_DETAIL.json", 32, true)
    put("BENCH_DETAIL_r17_close_quiesced.json", 32, true)
    put("BENCH_DETAIL_r18_early_quiesced.json", 32, true)
    // highest round wins, even over an in-round close of the previous
    assert(Bench.defaultBaseline(32, dir) ===
      Some("BENCH_DETAIL_r18_early_quiesced.json"))
    // close of a round outranks its early anchor
    put("BENCH_DETAIL_r18_close_quiesced.json", 32, true)
    assert(Bench.defaultBaseline(32, dir) ===
      Some("BENCH_DETAIL_r18_close_quiesced.json"))
    // env-mismatched (other parallelism) and failed-quiesce records
    // are skipped, not compared
    put("BENCH_DETAIL_r19_early_quiesced.json", 8, true)
    put("BENCH_DETAIL_r19_close_quiesced.json", 32, false)
    assert(Bench.defaultBaseline(32, dir) ===
      Some("BENCH_DETAIL_r18_close_quiesced.json"))
    // no qualifying quiesced record: fall back to BENCH_DETAIL.json
    Seq("BENCH_DETAIL_r17_close_quiesced.json",
      "BENCH_DETAIL_r18_early_quiesced.json",
      "BENCH_DETAIL_r18_close_quiesced.json").foreach(n =>
      new java.io.File(dir, n).delete())
    assert(Bench.defaultBaseline(16, dir) === Some("BENCH_DETAIL.json"))
  }
}
