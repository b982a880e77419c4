package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Resilience
import graft.sources.Resilience._

/** Deterministic-clock tests for the source-connector resilience layer
  * (`Utils/api.py` semantics: smart backoff, sliding-window limiter,
  * circuit breaker). No wall-clock anywhere: time advances only when the
  * code under test sleeps. */
class ResilienceSpec extends AnyFunSuite {

  /** Virtual clock: `sleep` advances `now` and records the request. */
  private class FakeClock(u: Double = 0.5) {
    var now = 0L
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val clock: Clock = Clock(() => now, ms => { sleeps += ms; now += ms }, () => u)
  }

  test("backoffMs: min(base·2^n, max) + uniform(0.1,0.3)·delay, deterministic under a fixed draw") {
    val fc = new FakeClock(u = 0.5) // jitter factor = 0.1 + 0.5·0.2 = 0.2
    assert(backoffMs(0, fc.clock) == 1200L)  // 1000 + 200
    assert(backoffMs(1, fc.clock) == 2400L)
    assert(backoffMs(5, fc.clock) == 38400L)
    assert(backoffMs(9, fc.clock) == 72000L) // capped: 60000 + 12000
  }

  test("fetchWithBackoff: success first try — no sleeps") {
    val fc = new FakeClock()
    assert(fetchWithBackoff(3, fc.clock)(_ => Ok("body")).contains("body"))
    assert(fc.sleeps.isEmpty)
  }

  test("fetchWithBackoff: Retry-After header wins over everything") {
    val fc = new FakeClock()
    val outcomes = Iterator[Outcome[String]](
      Status(429, retryAfterSec = Some(7)), Ok("late"))
    assert(fetchWithBackoff(3, fc.clock)(_ => outcomes.next()).contains("late"))
    assert(fc.sleeps.toSeq == Seq(7000L))
  }

  test("fetchWithBackoff: 429 waits by limit type — personal 1s, service 30s, unknown 10s") {
    def wait429(tpe: Option[String]): Long = {
      val fc = new FakeClock()
      val o = Iterator[Outcome[String]](Status(429, None, tpe), Ok("x"))
      fetchWithBackoff(3, fc.clock)(_ => o.next())
      fc.sleeps.head
    }
    assert(wait429(Some("personal")) == 1000L)
    assert(wait429(Some("service")) == 30000L)
    assert(wait429(None) == 10000L)
  }

  test("fetchWithBackoff: 5xx uses exponential backoff per attempt") {
    val fc = new FakeClock(u = 0.5)
    val o = Iterator[Outcome[String]](Status(503), Status(503), Ok("up"))
    assert(fetchWithBackoff(3, fc.clock)(_ => o.next()).contains("up"))
    assert(fc.sleeps.toSeq == Seq(1200L, 2400L)) // attempts 0, 1
  }

  test("fetchWithBackoff: 4xx client errors never retry and never sleep") {
    val fc = new FakeClock()
    var calls = 0
    assert(fetchWithBackoff(3, fc.clock) { _ => calls += 1; Status(404) }.isEmpty)
    assert(calls == 1 && fc.sleeps.isEmpty)
  }

  test("fetchWithBackoff: budget exhaustion returns None; the last attempt doesn't sleep") {
    val fc = new FakeClock()
    var calls = 0
    assert(fetchWithBackoff(3, fc.clock) { _ => calls += 1; Status(429) }.isEmpty)
    assert(calls == 3)
    assert(fc.sleeps.size == 2) // sleeps between attempts only
  }

  test("fetchWithBackoff: transport errors retry with backoff, then give up") {
    val fc = new FakeClock(u = 0.5)
    var calls = 0
    val boom = new RuntimeException("conn reset")
    assert(fetchWithBackoff(3, fc.clock) { _ => calls += 1; TransportError(boom) }.isEmpty)
    assert(calls == 3 && fc.sleeps.toSeq == Seq(1200L, 2400L))
  }

  test("sliding-window limiter: admits up to the cap, then waits out the oldest request") {
    val fc = new FakeClock()
    val rl = new SlidingWindowRateLimiter(Seq((3, 10L)), fc.clock)
    // t=0,1,2: three requests fill the window
    for (t <- Seq(0L, 1000L, 2000L)) {
      fc.now = t
      assert(rl.canMakeRequest()); rl.recordRequest()
    }
    fc.now = 5000L
    assert(!rl.canMakeRequest())
    assert(rl.waitMs() == 5000L) // oldest (t=0) leaves the window at t=10s
    fc.now = 10001L
    assert(rl.canMakeRequest()) // slot freed
  }

  test("sliding-window limiter: the TIGHTEST of several limits governs") {
    val fc = new FakeClock()
    // personal 2-per-10s AND method 3-per-60s (api.py:135-138 shape)
    val rl = new SlidingWindowRateLimiter(Seq((2, 10L), (3, 60L)), fc.clock)
    fc.now = 0L; rl.recordRequest()
    fc.now = 1000L; rl.recordRequest()
    fc.now = 2000L
    assert(rl.waitMs() == 8000L) // personal window blocks first
    fc.now = 11000L
    assert(rl.canMakeRequest()); rl.recordRequest()
    fc.now = 12000L
    assert(rl.waitMs() == 48000L) // now the 60s method window blocks (3 used)
  }

  test("sliding-window limiter: acquire() sleeps exactly the deficit then records") {
    val fc = new FakeClock()
    val rl = new SlidingWindowRateLimiter(Seq((1, 10L)), fc.clock)
    rl.acquire() // t=0, free
    rl.acquire() // must sleep 10s
    assert(fc.sleeps.toSeq == Seq(10000L))
    assert(fc.now == 10000L)
  }

  test("circuit breaker: opens at the threshold, HALF_OPENs after the recovery timeout") {
    val fc = new FakeClock()
    val cb = new CircuitBreaker(failureThreshold = 3, recoveryTimeoutSec = 60L, fc.clock)
    assert(cb.canExecute() && cb.state == "CLOSED")
    (1 to 3).foreach(_ => cb.onFailure())
    assert(cb.state == "OPEN" && !cb.canExecute())
    fc.now = 59000L
    assert(!cb.canExecute()) // still inside the recovery window
    fc.now = 61000L
    assert(cb.canExecute() && cb.state == "HALF_OPEN") // probe admitted
    cb.onSuccess()
    assert(cb.state == "CLOSED" && cb.canExecute())
  }

  test("circuit breaker: a failed HALF_OPEN probe re-opens immediately") {
    val fc = new FakeClock()
    val cb = new CircuitBreaker(failureThreshold = 2, recoveryTimeoutSec = 10L, fc.clock)
    cb.onFailure(); cb.onFailure()
    fc.now = 11000L
    assert(cb.canExecute() && cb.state == "HALF_OPEN")
    cb.onFailure()
    assert(cb.state == "OPEN" && !cb.canExecute())
  }

  test("S4 + resilience: a flaky paginated scan retries per page and still unions all pages") {
    // the reference's fetcher loop: each page fetch goes through the smart
    // retry wrapper; transient 5xx on a page must NOT truncate the scan
    val spark = TestSpark.spark
    import spark.implicits._
    val fc = new FakeClock(u = 0.5)
    val failuresLeft = scala.collection.mutable.Map(2 -> 2) // page 2: two 503s first
    val fetchedPages = scala.collection.mutable.Buffer.empty[Int]
    val result = graft.sources.Paginate.scan(page => {
      Resilience.fetchWithBackoff(maxRetries = 3, fc.clock) { _ =>
        fetchedPages += page
        if (failuresLeft.getOrElse(page, 0) > 0) {
          failuresLeft(page) -= 1; Status(503)
        } else if (page <= 3) Ok(Seq((page, s"row$page")).toDF("page", "v"))
        else Ok(spark.emptyDataset[(Int, String)].toDF("page", "v"))
      }
    })
    assert(result.isDefined)
    assert(result.get.count() == 3) // pages 1..3, page 2 recovered via retry
    assert(fetchedPages.count(_ == 2) == 3) // two failures + one success
    assert(fc.sleeps.toSeq == Seq(1200L, 2400L)) // page 2's two backoffs
  }

  test("guardedFetch: breaker gate → limiter pacing → fetch; failures feed the breaker") {
    val fc = new FakeClock()
    val rl = new SlidingWindowRateLimiter(Seq((1, 5L)), fc.clock)
    val cb = new CircuitBreaker(failureThreshold = 2, recoveryTimeoutSec = 60L, fc.clock)
    // two paced successes: second waits out the limiter window
    assert(Resilience.guardedFetch(rl, cb, 3, fc.clock)(_ => Ok(1)).contains(1))
    assert(Resilience.guardedFetch(rl, cb, 3, fc.clock)(_ => Ok(2)).contains(2))
    assert(fc.sleeps.toSeq == Seq(5000L))
    // two hard failures trip the breaker; the next call is rejected unfetched
    (1 to 2).foreach(_ => Resilience.guardedFetch(rl, cb, 1, fc.clock)(_ => Status(404)))
    assert(cb.state == "OPEN")
    var fetched = false
    assert(Resilience.guardedFetch(rl, cb, 3, fc.clock) { _ => fetched = true; Ok(3) }.isEmpty)
    assert(!fetched)
  }
}
