package graft.transport

/** The supervision loop all four replication pumps share: run
  * sessions, reconnect on wire failure with a capped exponential
  * backoff ladder (progress within a session resets it), give up
  * after `maxReconnects` CONSECUTIVE failures. Each pump supplies its
  * session body, its progress counter, and a position string for the
  * give-up message — resume semantics stay in the pump (file+pos /
  * confirmed LSN / repl offset / resume token).
  */
trait PumpSupervision {
  /** One full dial-to-drop session; returns units captured. */
  def runSession(until: () => Boolean = () => false): Long

  /** Monotone progress counter (events/frames/bytes/docs). */
  protected def progress: Long

  /** Rendered resume position for the give-up error. */
  protected def positionLabel: String

  protected def maxReconnects: Int
  protected def baseBackoffMs: Long
  protected def maxBackoffMs: Long

  var reconnects = 0

  final def backoffMs(attempt: Int): Long =
    math.min(maxBackoffMs,
      baseBackoffMs * (1L << math.min(math.max(attempt - 1, 0), 16)))

  final def run(until: () => Boolean,
      sleep: Long => Unit = Thread.sleep): Unit = {
    var consecutiveFailures = 0
    while (!until() && consecutiveFailures <= maxReconnects) {
      val before = progress
      try {
        runSession(until)
        if (until()) return
        if (progress > before) consecutiveFailures = 0
        else {
          // a CLEAN session end that captured nothing (the server
          // keeps closing the stream — CopyDone on shutdown/failover,
          // an instantly-dead cursor): without a backoff this was an
          // unthrottled dial/auth loop hammering the server forever,
          // with neither the ladder nor the give-up counter engaging
          consecutiveFailures += 1
          reconnects += 1
          if (!until() && consecutiveFailures <= maxReconnects)
            sleep(backoffMs(consecutiveFailures))
        }
      } catch {
        case _: java.io.IOException | _: java.io.EOFException =>
          // progress this session resets the backoff ladder
          if (progress > before) consecutiveFailures = 0
          consecutiveFailures += 1
          reconnects += 1
          if (!until() && consecutiveFailures <= maxReconnects)
            sleep(backoffMs(consecutiveFailures))
      }
    }
    if (consecutiveFailures > maxReconnects)
      throw new java.io.IOException(
        s"pump gave up after $maxReconnects reconnects at " +
          positionLabel)
  }
}
