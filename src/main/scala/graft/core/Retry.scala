package graft.core

import scala.annotation.tailrec
import scala.concurrent.duration._
import scala.util.control.NonFatal

/** Driver-side retry with linear backoff (SURVEY §2.12 C3).
  *
  * Mirrors the reference's Sheets fetch loop (`gs_utils.py:51-63`): at most
  * `maxAttempts` tries, sleeping `(attempt + 1) × base` between failures —
  * attempt is 0-based, so the first retry waits 1×base, the second 2×base, …
  * The sleeper is injectable so tests never actually sleep.
  */
object Retry {
  def linearBackoff(base: FiniteDuration = 10.seconds): Int => FiniteDuration =
    attempt => base * (attempt + 1).toLong

  def retry[A](
      maxAttempts: Int = 6,
      backoff: Int => FiniteDuration = linearBackoff(),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)
  )(thunk: => A): A =
    retryWhen(NonFatal(_), maxAttempts, backoff, sleep)(thunk)

  /** [[retry]] gated on a predicate: only failures `shouldRetry` admits are
    * retried — anything else (and any fatal error) propagates immediately.
    * The shape a commit-race loop needs: a lost optimistic-concurrency race
    * is worth retrying, a broken frame is not.
    */
  def retryWhen[A](
      shouldRetry: Throwable => Boolean,
      maxAttempts: Int = 6,
      backoff: Int => FiniteDuration = linearBackoff(),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)
  )(thunk: => A): A = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    @tailrec def loop(attempt: Int): A = {
      val res =
        try Right(thunk)
        catch { case NonFatal(e) if shouldRetry(e) => Left(e) }
      res match {
        case Right(a) => a
        case Left(e) if attempt + 1 >= maxAttempts => throw e
        case Left(_) =>
          sleep(backoff(attempt))
          loop(attempt + 1)
      }
    }
    loop(0)
  }
}
