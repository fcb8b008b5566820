package graft.infra

/** Token-bucket rate limiter — the reference's rps limiter
  * (`/root/reference/dt-common/src/utils/limiter/rate_limiter.rs:1-61`,
  * governor-backed: `Quota::per_second(rate)`, `until_n_ready(n)`):
  * tokens refill continuously at `ratePerSec` up to a burst capacity;
  * `acquire(n)` blocks until n tokens are available; acquiring more
  * than the capacity in one call is an error (it could never succeed);
  * rate 0 disables limiting (the reference logs and falls back to
  * unlimited).
  *
  * Pure arithmetic over an injectable nanosecond clock, so specs drive
  * it deterministically; the sleeper is injectable too (production
  * sleeps the executor thread between micro-batch applies — exactly
  * where the reference's pipeline awaits the governor).
  */
final class RateLimiter(ratePerSec: Long, burstIn: Long = 0,
    nanoTime: () => Long = () => System.nanoTime(),
    sleepNanos: Long => Unit = n => Thread.sleep(n / 1000000L,
      (n % 1000000L).toInt)) {

  /** Unlimited when rate ≤ 0. */
  val unlimited: Boolean = ratePerSec <= 0
  /** Bucket capacity: the allowed burst (default = one second's quota). */
  val capacity: Long = if (burstIn > 0) burstIn else math.max(ratePerSec, 1)

  private var tokens: Double = capacity.toDouble
  private var last: Long = nanoTime()

  private def refill(): Unit = {
    val now = nanoTime()
    val dt = (now - last) / 1e9
    last = now
    tokens = math.min(capacity.toDouble, tokens + dt * ratePerSec)
  }

  /** Currently available whole tokens. */
  def available(): Long = synchronized { refill(); tokens.toLong }

  /** Take n tokens if available without waiting. */
  def tryAcquire(n: Long): Boolean = synchronized {
    if (unlimited || n <= 0) true
    else {
      refill()
      if (tokens >= n) { tokens -= n; true } else false
    }
  }

  /** Block until n tokens are available; returns the nanoseconds slept.
    * n > capacity can never be satisfied — fail loudly like the
    * reference's `exceeds max capacity` error.
    */
  def acquire(n: Long): Long = {
    if (unlimited || n <= 0) return 0L
    require(n <= capacity,
      s"$n exceeds max capacity $capacity of the rate limiter")
    var slept = 0L
    var done = false
    while (!done) {
      val waitNanos = synchronized {
        refill()
        if (tokens >= n) { tokens -= n; done = true; 0L }
        else ((n - tokens) / ratePerSec * 1e9).toLong + 1
      }
      if (!done) { sleepNanos(waitNanos); slept += waitNanos }
    }
    slept
  }
}
