package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.SessionEvent

/** Custom-state sessionization semantics: sessions close on gap or
  * event-time timeout, and state does not linger past the watermark.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("gap split within a batch closes the earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = Sessionize.sessionize(in.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 7: two events 10 min apart (one session), then a 2-hour jump
    // (same batch) -> first session closes immediately
    in.addData(
      SessionEvent(7L, t("2024-05-01 10:00:00")),
      SessionEvent(7L, t("2024-05-01 10:10:00")),
      SessionEvent(7L, t("2024-05-01 12:30:00")))
    q.processAllAvailable()
    val first = spark.table("sessions")
      .as[Sessionize.ClosedSession].collect()
    assert(first.toSeq === Seq(
      Sessionize.ClosedSession(7L, t("2024-05-01 10:00:00"), 2)))

    // advance the watermark via another user so user 7's open session
    // (last event 12:30) times out: watermark 14:00 > 12:30 + 30min
    in.addData(SessionEvent(8L, t("2024-05-01 14:00:00")))
    q.processAllAvailable()
    in.addData(SessionEvent(8L, t("2024-05-01 14:01:00")))
    q.processAllAvailable()
    val closed = spark.table("sessions")
      .as[Sessionize.ClosedSession].collect().toSet
    assert(closed.contains(
      Sessionize.ClosedSession(7L, t("2024-05-01 12:30:00"), 1)))
    q.stop()
  }
}
