package graft

import java.io.File
import java.nio.file.Files
import graft.sources.BuildOnce

/** The build-once artifact guard: single build per stamp, stamp-keyed
  * staleness, and recovery from half-written leftovers. (The cross-JVM
  * rename race is exercised implicitly by Verify/Bench/test JVMs sharing
  * artifacts; these tests pin the single-JVM contract.) */
class BuildOnceSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val runId = System.nanoTime() // unique stamps per test run

  private def complete(base: String): Boolean = new File(s"$base/DONE").exists()
  private def build(counter: java.util.concurrent.atomic.AtomicInteger)(dir: String): Unit = {
    counter.incrementAndGet()
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.writeString(java.nio.file.Paths.get(s"$dir/DONE"), "ok")
  }

  test("builds once per stamp; repeat calls reuse without rebuilding") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d1 = BuildOnce.dir("graft_testart", s"s1-$runId", complete)(build(n))
    val d2 = BuildOnce.dir("graft_testart", s"s1-$runId", complete)(build(n))
    assert(d1 == d2 && n.get() == 1 && complete(d1))
  }

  test("a different stamp routes to a different directory and rebuilds") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d1 = BuildOnce.dir("graft_testart", s"s2-$runId", complete)(build(n))
    val d2 = BuildOnce.dir("graft_testart", s"s2b-$runId", complete)(build(n))
    assert(d1 != d2 && n.get() == 2)
  }

  private def plantIncomplete(stamp: String): String = {
    // precompute the artifact path the same way BuildOnce does and plant
    // an INCOMPLETE directory there (no DONE marker — a build-in-place
    // crash leftover)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_testart_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(stamp.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    Files.createDirectories(java.nio.file.Paths.get(base))
    Files.writeString(java.nio.file.Paths.get(s"$base/partial"), "junk")
    base
  }

  test("an OLD half-written leftover directory is cleared and rebuilt in place") {
    val stamp = s"s3-$runId"
    val base = plantIncomplete(stamp)
    // age it past the staleness horizon so the clear path is taken
    new File(base).setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L)
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d = BuildOnce.dir("graft_testart", stamp, complete)(build(n))
    assert(d == base && n.get() == 1 && complete(d))
    assert(!new File(s"$d/partial").exists(), "half-written leftovers survived")
  }

  test("a YOUNG incomplete occupant is left alone; a complete private build is served") {
    val stamp = s"s4-$runId"
    val base = plantIncomplete(stamp) // fresh mtime — could be a racer mid-build
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d = BuildOnce.dir("graft_testart", stamp, complete)(build(n))
    assert(d != base && n.get() == 1 && complete(d),
      s"expected a private complete build, got $d")
    assert(new File(s"$base/partial").exists(), "young occupant was destroyed")
  }
}
