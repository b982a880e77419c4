package graft.sources

/** Source-connector resilience machinery (SURVEY §2.1 — the reference's
  * `Utils/api.py`: smart retry/backoff `:50-103`, sliding-window rate
  * limiter `:132-167`, circuit breaker `:170-199`).
  *
  * This is DRIVER-side plumbing for paginated/keyed source connectors
  * (S3/S4/S6/S7): the fetch loop that feeds batches into the engine, not a
  * distributed operator — so it has no oracle form and is spec-tested with
  * a deterministic clock instead.
  *
  * Everything time-shaped is injected ([[Clock]]): `now`, `sleep`, and the
  * jitter draw, so the specs assert exact wait sequences with no
  * wall-clock flake, and production swaps in [[Clock.system]].
  */
object Resilience {

  /** Injectable time source: `nowMs`, `sleepMs`, and a uniform [0,1) draw
    * for jitter. */
  final case class Clock(nowMs: () => Long, sleepMs: Long => Unit, uniform: () => Double)
  object Clock {
    val system: Clock = Clock(
      () => System.currentTimeMillis(),
      ms => if (ms > 0) Thread.sleep(ms),
      () => scala.util.Random.nextDouble())
  }

  /** One fetch attempt's outcome, as the retry loop sees it. */
  sealed trait Outcome[+A]
  /** 200. */
  final case class Ok[A](body: A) extends Outcome[A]
  /** Non-200 status, with the rate-limit headers the reference inspects
    * (`Retry-After`, `X-Rate-Limit-Type`). */
  final case class Status(code: Int, retryAfterSec: Option[Int] = None,
      rateLimitType: Option[String] = None) extends Outcome[Nothing]
  /** Transport-level failure (the `RequestException` branch). */
  final case class TransportError(error: Throwable) extends Outcome[Nothing]

  /** Exponential backoff with jitter (`api.py:51-58`):
    * `min(base·2^attempt, max) + uniform(0.1, 0.3)·delay`. */
  def backoffMs(attempt: Int, clock: Clock, baseMs: Long = 1000L,
      maxMs: Long = 60000L): Long = {
    val delay = math.min(baseMs * (1L << attempt), maxMs)
    val jitter = (0.1 + clock.uniform() * 0.2) * delay
    delay + jitter.toLong
  }

  /** Wait for a 429 response (`handle_rate_limit_response`, `api.py:15-48`):
    * `Retry-After` wins; else wait by limit type (personal 1 s, service
    * 30 s, unknown 10 s).
    *
    * 429-only by design: the reference's fetch loop
    * (`make_api_request_with_smart_backoff`, `api.py:79-84`) routes every
    * OTHER retryable status (5xx) to `exponential_backoff` and only calls
    * `handle_rate_limit_response` for 429 — its own 5xx/4 s branch is
    * unreachable there, and is deliberately not reproduced here. */
  def rateLimitWaitSec(status: Status): Int =
    status.retryAfterSec.getOrElse {
      status.rateLimitType match {
        case Some("personal") => 1
        case Some("service")  => 30
        case _                => 10
      }
    }

  /** The reference's smart fetch loop (`make_api_request_with_smart_backoff`,
    * `api.py:62-103`), typed: up to `maxRetries` attempts of `fetch`;
    *  - `Ok` → `Some(body)`;
    *  - 429 → smart wait ([[rateLimitWaitSec]]), retry;
    *  - other ≥430 (incl. 5xx) → exponential backoff, retry;
    *  - 400..428 client error → give up immediately (no retry, no sleep);
    *  - transport error → exponential backoff, retry;
    *  - budget exhausted → `None` (the final failing attempt does NOT
    *    sleep — there is nothing left to wait for).
    */
  def fetchWithBackoff[A](maxRetries: Int = 3, clock: Clock = Clock.system)(
      fetch: Int => Outcome[A]): Option[A] = {
    var attempt = 0
    while (attempt < maxRetries) {
      val last = attempt == maxRetries - 1
      fetch(attempt) match {
        case Ok(body) => return Some(body)
        case s @ Status(code, _, _) if code >= 429 =>
          if (last) return None
          val waitMs =
            if (code == 429) rateLimitWaitSec(s) * 1000L
            else backoffMs(attempt, clock)
          clock.sleepMs(waitMs)
        case Status(code, _, _) if code >= 400 && code < 429 =>
          return None // client error: retrying can't fix the request
        case Status(_, _, _) =>
          return None // unexpected non-retryable status (1xx/3xx)
        case TransportError(_) =>
          if (last) return None
          clock.sleepMs(backoffMs(attempt, clock))
      }
      attempt += 1
    }
    None
  }

  /** Sliding-window pre-emptive rate limiter (`AdvancedRateLimiter`,
    * `api.py:132-167`): N named limits over trailing windows; a request is
    * allowed only if EVERY window has headroom. `waitMs` is how long until
    * the tightest violated window frees a slot. */
  final class SlidingWindowRateLimiter(
      limits: Seq[(Int, Long)], // (maxRequests, windowSec)
      clock: Clock = Clock.system) {
    private val maxWindowMs = limits.map(_._2).max * 1000L
    private var history = Vector.empty[Long]

    private def prune(now: Long): Unit =
      history = history.filter(now - _ < maxWindowMs)

    /** Milliseconds until a request would be admitted (0 = now). */
    def waitMs(): Long = {
      val now = clock.nowMs()
      prune(now)
      limits.map { case (maxReq, windowSec) =>
        val windowMs = windowSec * 1000L
        val recent = history.filter(now - _ < windowMs)
        if (recent.size < maxReq) 0L
        else windowMs - (now - recent.min)
      }.max
    }

    def canMakeRequest(): Boolean = waitMs() == 0L

    def recordRequest(): Unit = {
      val now = clock.nowMs()
      prune(now)
      history = history :+ now
    }

    /** Block (via the injected sleep) until admitted, then record. */
    def acquire(): Unit = {
      var w = waitMs()
      while (w > 0) { clock.sleepMs(w); w = waitMs() }
      recordRequest()
    }
  }

  /** Circuit breaker (`api.py:170-199`): CLOSED → OPEN after
    * `failureThreshold` consecutive failures; OPEN rejects until
    * `recoveryTimeoutSec` has passed since the last failure, then
    * HALF_OPEN admits a probe; success closes, failure re-opens. */
  final class CircuitBreaker(
      failureThreshold: Int = 5,
      recoveryTimeoutSec: Long = 60L,
      clock: Clock = Clock.system) {
    sealed trait State
    case object Closed extends State
    case object Open extends State
    case object HalfOpen extends State

    private var failures = 0
    private var lastFailureMs = 0L
    private var st: State = Closed

    def state: String = st match {
      case Closed => "CLOSED"; case Open => "OPEN"; case HalfOpen => "HALF_OPEN"
    }

    def canExecute(): Boolean = st match {
      case Closed => true
      case Open =>
        if (clock.nowMs() - lastFailureMs > recoveryTimeoutSec * 1000L) {
          st = HalfOpen; true
        } else false
      case HalfOpen => true
    }

    def onSuccess(): Unit = { failures = 0; st = Closed }

    def onFailure(): Unit = {
      failures += 1
      lastFailureMs = clock.nowMs()
      if (failures >= failureThreshold) st = Open
    }
  }

  /** The assembled source-connector guard: breaker gate → limiter admit →
    * smart-backoff fetch → breaker feedback. This is the loop the
    * reference's `highElo`/`matchList`/`match` wrappers run per request
    * (`api.py:107-129`). */
  def guardedFetch[A](limiter: SlidingWindowRateLimiter, breaker: CircuitBreaker,
      maxRetries: Int = 3, clock: Clock = Clock.system)(
      fetch: Int => Outcome[A]): Option[A] = {
    if (!breaker.canExecute()) return None
    limiter.acquire()
    val out = fetchWithBackoff(maxRetries, clock)(fetch)
    if (out.isDefined) breaker.onSuccess() else breaker.onFailure()
    out
  }
}
