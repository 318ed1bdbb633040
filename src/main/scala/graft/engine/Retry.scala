package graft.engine

/** Bounded retry with a fixed delay — the job-level retry policy the
  * reference declares on every task (`default_args = {"retries": 5,
  * "retry_delay": timedelta(minutes=5)}`, `dags/raw_from_api_to_s3
  * .py:58-62`; the other two DAGs repeat it). Every graft write is an
  * idempotent upsert/overwrite, so re-running a failed step is always
  * safe — this utility only automates the re-run.
  *
  * The sleeper is injectable so specs assert the retry COUNT and the
  * requested delays without waiting wall-clock minutes. Retries apply
  * to transient failures only in spirit; like the reference's Airflow
  * policy, any Exception is retried — a deterministic bug simply fails
  * `attempts` times and then propagates (with the prior failures
  * attached as suppressed exceptions, so nothing is swallowed).
  *
  * Fatal `Error`s (OOM, linkage) are NOT retried: rerunning a JVM in
  * that state hides the real problem.
  */
object Retry {

  val DefaultAttempts = 6 // 1 initial + 5 retries, as the reference
  val DefaultDelayMs: Long = 5L * 60L * 1000L

  def withRetries[A](
      attempts: Int = DefaultAttempts,
      delayMs: Long = DefaultDelayMs,
      sleep: Long => Unit = Thread.sleep,
      onRetry: (Int, Throwable) => Unit = (_, _) => ())(body: => A): A = {
    require(attempts >= 1, "attempts must be >= 1")
    var failures: List[Exception] = Nil
    var attempt = 0
    while (attempt < attempts) {
      attempt += 1
      try return body
      catch {
        case e: Exception if attempt < attempts =>
          failures ::= e
          onRetry(attempt, e)
          sleep(delayMs)
        case e: Exception =>
          failures.foreach(e.addSuppressed)
          throw e
      }
    }
    throw new IllegalStateException("unreachable: loop exits via return/throw")
  }
}
