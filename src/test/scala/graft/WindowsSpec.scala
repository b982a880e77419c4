package graft

import java.nio.file.Files
import graft.driver.Windows
import graft.driver.Windows.{Process, WaitForClock, WindowState}
import graft.sinks.Writers

/** Window state machine semantics (`functions.sh:107-148` parity). */
class WindowsSpec extends SparkSpec {

  private val day = 24 * 3600L

  test("advance: +2 days normal, +4 accelerated, contiguous windows") {
    val w = WindowState(0, 2 * day)
    Windows.advance(w, nowEpoch = 100 * day) match {
      case Process(n) => assert(n == WindowState(2 * day, 4 * day))
      case x => fail(s"expected Process, got $x")
    }
    Windows.advance(w, nowEpoch = 100 * day, accelerated = true) match {
      case Process(n) => assert(n == WindowState(2 * day, 6 * day))
      case x => fail(s"expected Process, got $x")
    }
  }

  test("clamp-to-now: windows ending in the future are refused") {
    val w = WindowState(0, 2 * day)
    Windows.advance(w, nowEpoch = 3 * day) match {
      case WaitForClock(n) => assert(n.endEpoch == 4 * day)
      case x => fail(s"expected WaitForClock, got $x")
    }
    // exactly-now is allowed (end <= now)
    assert(Windows.advance(w, nowEpoch = 4 * day).isInstanceOf[Process])
  }

  test("cadence: accelerated while lagging > threshold, normal when caught up") {
    val w = WindowState(0, 2 * day)
    assert(Windows.chooseAccelerated(w, nowEpoch = 20 * day))
    assert(!Windows.chooseAccelerated(w, nowEpoch = 8 * day))
  }

  test("step: bootstraps, persists after processing, and resumes from the state file") {
    val dir = Files.createTempDirectory("graft_state").toString
    val path = s"$dir/next_window.json"
    val boot = WindowState(0, 2 * day)
    val first = Windows.step(path, nowEpoch = 30 * day, boot)(_ => ())
    // lag 28d > 7d threshold → accelerated +4d from bootstrap end
    assert(first.contains(WindowState(2 * day, 6 * day)))
    assert(Writers.readState(path).contains((2 * day, 6 * day)))
    val second = Windows.step(path, nowEpoch = 30 * day, boot)(_ => ())
    assert(second.contains(WindowState(6 * day, 10 * day)))
    // caught-up driver waits without touching state
    val stuck = Windows.step(path, nowEpoch = 10 * day, boot)(_ => ())
    assert(stuck.isEmpty)
    assert(Writers.readState(path).contains((6 * day, 10 * day)))
  }

  test("step: a FAILED batch leaves state untouched — the window re-drives") {
    val dir = Files.createTempDirectory("graft_state3").toString
    val path = s"$dir/next_window.json"
    val boot = WindowState(0, 2 * day)
    Windows.step(path, nowEpoch = 30 * day, boot)(_ => ())
    assert(Writers.readState(path).contains((2 * day, 6 * day)))
    intercept[RuntimeException] {
      Windows.step(path, nowEpoch = 30 * day, boot)(_ =>
        throw new RuntimeException("etl failed"))
    }
    // state did NOT advance past the failed window
    assert(Writers.readState(path).contains((2 * day, 6 * day)))
    val retry = Windows.step(path, nowEpoch = 30 * day, boot)(_ => ())
    assert(retry.contains(WindowState(6 * day, 10 * day)))
  }

  test("state JSON round-trips (K9)") {
    val dir = Files.createTempDirectory("graft_state2").toString
    val path = s"$dir/sub/state.json"
    Writers.writeState(path, 1753704000L, 1753876800L)
    assert(Writers.readState(path).contains((1753704000L, 1753876800L)))
    assert(Writers.readState(s"$dir/absent.json").isEmpty)
  }
}
