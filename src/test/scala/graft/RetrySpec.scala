package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Retry

class RetrySpec extends AnyFunSuite {

  test("returns the first success without sleeping") {
    var slept = 0
    val r = Retry.withRetries(sleep = _ => slept += 1)(42)
    assert(r == 42 && slept == 0)
  }

  test("retries transient failures, sleeping the configured delay each time") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = Retry.withRetries(attempts = 6, delayMs = 123L,
      sleep = delays += _) {
      calls += 1
      if (calls < 4) sys.error(s"transient $calls")
      "ok"
    }
    assert(r == "ok")
    assert(calls == 4)
    assert(delays.toSeq == Seq(123L, 123L, 123L))
  }

  test("exhausted attempts rethrow the last failure with priors suppressed") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries(attempts = 3, delayMs = 1L, sleep = _ => ()) {
        calls += 1
        sys.error(s"boom $calls")
      }
    }
    assert(calls == 3)
    assert(e.getMessage == "boom 3")
    assert(e.getSuppressed.map(_.getMessage).toSet == Set("boom 1", "boom 2"))
  }

  test("Errors are not retried") {
    var calls = 0
    intercept[AssertionError] {
      Retry.withRetries(attempts = 5, delayMs = 1L, sleep = _ => ()) {
        calls += 1
        throw new AssertionError("fatal")
      }
    }
    assert(calls == 1)
  }
}
