package graft

import java.io.File
import java.nio.file.Files
import graft.sources.{ArtifactStore, BuildOnce}

/** The build-once artifact guard: single build per stamp, stamp-keyed
  * staleness, and crash-leftover recovery — now over the versioned
  * commit-marker protocol ([[graft.sources.ArtifactStore]]), so a
  * half-written build is simply an uncommitted (invisible) version, and
  * nothing is ever cleared in place. */
class BuildOnceSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val runId = System.nanoTime() // unique stamps per test run

  // BuildOnce paths are FileSystem-qualified (e.g. `file:/tmp/...`);
  // strip the scheme for the java.nio/java.io sides of this spec
  private def local(p: String): String = p.stripPrefix("file:")
  private def complete(base: String): Boolean = new File(s"${local(base)}/DONE").exists()
  private def build(counter: java.util.concurrent.atomic.AtomicInteger)(dir: String): Unit = {
    counter.incrementAndGet()
    Files.createDirectories(java.nio.file.Paths.get(local(dir)))
    Files.writeString(java.nio.file.Paths.get(s"${local(dir)}/DONE"), "ok")
  }

  /** The artifact ROOT BuildOnce derives for a stamp (mirrors its MD5
    * keying; version dirs live under it). */
  private def rootOf(stamp: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_testart_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(stamp.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)

  test("builds once per stamp; repeat calls reuse without rebuilding") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d1 = BuildOnce.dir("graft_testart", s"s1-$runId", complete)(build(n))
    val d2 = BuildOnce.dir("graft_testart", s"s1-$runId", complete)(build(n))
    assert(d1 == d2 && n.get() == 1 && complete(d1))
    // the returned dir is a COMMITTED version under the stamp's root
    assert(local(d1).startsWith(rootOf(s"s1-$runId")))
    assert(new File(s"${local(d1)}/${ArtifactStore.Marker}").exists())
  }

  test("a different stamp routes to a different directory and rebuilds") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d1 = BuildOnce.dir("graft_testart", s"s2-$runId", complete)(build(n))
    val d2 = BuildOnce.dir("graft_testart", s"s2b-$runId", complete)(build(n))
    assert(d1 != d2 && n.get() == 2)
  }

  test("an UNCOMMITTED crash leftover is invisible: a fresh version is built beside it") {
    val stamp = s"s3-$runId"
    val root = rootOf(stamp)
    // plant a half-written stage dir: version-shaped name, data, NO marker
    val leftover = s"$root/v0000000001_999_crashleftover"
    Files.createDirectories(java.nio.file.Paths.get(leftover))
    Files.writeString(java.nio.file.Paths.get(s"$leftover/partial"), "junk")
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d = BuildOnce.dir("graft_testart", stamp, complete)(build(n))
    assert(d != leftover && n.get() == 1 && complete(d))
    // recovery never mutates in place: the leftover survives for vacuum
    assert(new File(s"$leftover/partial").exists(), "leftover was destroyed in place")
    ArtifactStore.vacuum(ArtifactStore.fs(root), root, keep = 1, staleMs = 0L)
    assert(!new File(leftover).exists(), "vacuum should reclaim the stale stage dir")
    assert(complete(d), "vacuum must keep the committed current version")
  }

  test("a committed-but-corrupt version is superseded, not repaired in place") {
    val stamp = s"s4-$runId"
    val root = rootOf(stamp)
    // plant a COMMITTED version that fails the caller's completeness check
    val bad = s"$root/v0000000001_999_corrupt"
    Files.createDirectories(java.nio.file.Paths.get(bad))
    Files.writeString(java.nio.file.Paths.get(s"$bad/${ArtifactStore.Marker}"), "")
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val d = BuildOnce.dir("graft_testart", stamp, complete)(build(n))
    assert(d != bad && n.get() == 1 && complete(d),
      s"expected a fresh superseding version, got $d")
    // the new version outranks the corrupt one for every later reader
    val cur = ArtifactStore.currentDir(ArtifactStore.fs(root), root).map(_.toString)
    assert(cur.contains(d))
  }
}
