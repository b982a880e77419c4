package graft.driver

import graft.sinks.Writers

/** Incremental event-time window state machine (SURVEY §2.10, §3.1 —
  * `ec2_deploy/scripts/functions.sh:107-148`, `run.sh:170-274`).
  *
  * The reference advances a `[start_epoch, end_epoch)` window by +2 days
  * per run (+4 accelerated), refuses windows ending in the future
  * (clamp/shutdown to let wall-clock catch up), and persists the window as
  * a tiny JSON state document between runs. This is pure driver logic —
  * deterministic and unit-testable — feeding a per-window batch query
  * (`events.filter(ts ∈ [start,end))`); Structured Streaming covers the
  * continuous case (see graft.streaming). */
object Windows {

  val NormalStepSec: Long = 2L * 24 * 3600
  val AcceleratedStepSec: Long = 4L * 24 * 3600

  final case class WindowState(startEpoch: Long, endEpoch: Long) {
    require(startEpoch < endEpoch, s"empty window [$startEpoch,$endEpoch)")
  }

  sealed trait Advance
  /** Run this window, then persist it as the new state. */
  final case class Process(next: WindowState) extends Advance
  /** Next window would end in the future — do nothing, keep state
    * (the reference shuts down and lets the cron re-drive later,
    * `functions.sh:124-148`). */
  final case class WaitForClock(wouldBe: WindowState) extends Advance

  /** Advance the window: next = [current.end, current.end + step), clamped
    * against `nowEpoch` (the watermark: never process the future). */
  def advance(current: WindowState, nowEpoch: Long,
      accelerated: Boolean = false): Advance = {
    val step = if (accelerated) AcceleratedStepSec else NormalStepSec
    val next = WindowState(current.endEpoch, current.endEpoch + step)
    if (next.endEpoch > nowEpoch) WaitForClock(next) else Process(next)
  }

  /** Cadence control (`SLOWDOWN`/`ACCELERATE`/`FORCE_FAST` SSM flags,
    * `functions.sh:47-84`): accelerate while the window lags `nowEpoch` by
    * more than `lagThresholdSec`, drop back to normal once caught up. */
  def chooseAccelerated(current: WindowState, nowEpoch: Long,
      lagThresholdSec: Long = 7L * 24 * 3600): Boolean =
    nowEpoch - current.endEpoch > lagThresholdSec

  /** Drive state from disk: read (or bootstrap), advance, run `process`
    * on the window, and persist the new state ONLY after `process`
    * returns — a failed batch leaves the state untouched, so the same
    * window is re-driven next run (at-least-once, like the reference's
    * leftover re-drive) instead of being silently skipped. */
  def step(statePath: String, nowEpoch: Long, bootstrap: => WindowState)(
      process: WindowState => Unit): Option[WindowState] = {
    val current = Writers.readState(statePath)
      .map { case (a, b) => WindowState(a, b) }.getOrElse(bootstrap)
    advance(current, nowEpoch, chooseAccelerated(current, nowEpoch)) match {
      case Process(next) =>
        process(next)
        Writers.writeState(statePath, next.startEpoch, next.endEpoch)
        Some(next)
      case WaitForClock(_) => None
    }
  }
}
