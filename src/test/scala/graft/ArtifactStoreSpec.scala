package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import graft.sources.ArtifactStore

/** Object-store shim: a local filesystem whose `rename` always throws —
  * the defining constraint of S3-class stores, where "rename" is a
  * non-atomic client-side copy+delete and no commit protocol may rely
  * on it. Registered under the `norename:` scheme via `fs.norename.impl`. */
class NoRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      s"rename($src, $dst): object-store shim has no rename primitive")
}

/** The artifact commit protocol, driven end to end through a filesystem
  * that REJECTS rename: versions stage privately, publish by a single
  * marker-file PUT, supersede without touching predecessors, and vacuum
  * reclaims the rest. This is the proof that the index/artifact
  * lifecycle (BuildOnce, DedupIndex create/absorb/compact) carries no
  * hidden POSIX-rename assumption. (Job-internal task-commit renames
  * inside a staged dir belong to the configured output committer —
  * pluggable per store — not to this protocol.) */
class ArtifactStoreSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def shimConf = {
    val c = new org.apache.hadoop.conf.Configuration()
    c.set("fs.norename.impl", classOf[NoRenameFileSystem].getName)
    c.set("fs.norename.impl.disable.cache", "true")
    c
  }

  private def freshBase(tag: String): String =
    "norename:" + java.nio.file.Files.createTempDirectory(tag).toString + "/artifact"

  private def put(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      name: String, body: String): Unit = {
    val out = fs.create(new Path(dir, name), true)
    out.write(body.getBytes("UTF-8")); out.close()
  }

  private def read(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("full lifecycle on a rename-rejecting store: commit, supersede, crash, vacuum") {
    val base = freshBase("graft_store")
    val fs = ArtifactStore.fs(base, shimConf)
    // the shim really has no rename
    intercept[UnsupportedOperationException] {
      fs.rename(new Path(base), new Path(s"${base}_elsewhere"))
    }

    assert(ArtifactStore.currentDir(fs, base).isEmpty)
    val v1 = ArtifactStore.commit(fs, base)(d => put(fs, d, "data", "one"))
    assert(ArtifactStore.currentDir(fs, base).contains(v1))
    assert(read(fs, new Path(v1, "data")) == "one")

    // a second commit supersedes; the predecessor is NOT touched (a
    // reader mid-scan of v1 keeps a complete snapshot)
    val v2 = ArtifactStore.commit(fs, base)(d => put(fs, d, "data", "two"))
    assert(v2 != v1)
    assert(ArtifactStore.currentDir(fs, base).contains(v2))
    assert(read(fs, new Path(v1, "data")) == "one", "predecessor disturbed")

    // a crash mid-build leaves an UNCOMMITTED stage dir — invisible to
    // every reader, current unchanged
    val boom = intercept[RuntimeException] {
      ArtifactStore.commit(fs, base) { d =>
        put(fs, d, "data", "half"); throw new RuntimeException("crash mid-build")
      }
    }
    assert(boom.getMessage == "crash mid-build")
    assert(ArtifactStore.currentDir(fs, base).contains(v2))
    assert(ArtifactStore.versions(fs, base).map(_._3) == Seq(v2, v1))

    // vacuum keeps the newest committed version, reclaims the
    // superseded one and the stale crash leftover
    ArtifactStore.vacuum(fs, base, keep = 1, staleMs = 0L)
    assert(ArtifactStore.versions(fs, base).map(_._3) == Seq(v2))
    assert(!fs.exists(new Path(v1, "data")))
    assert(fs.listStatus(new Path(base)).count(_.isDirectory) == 1,
      "crash leftover should be reclaimed")
    assert(read(fs, new Path(v2, "data")) == "two")
  }

  test("commitExclusive: claim-serialized read-modify-write; waits, reaps, rebases") {
    val base = freshBase("graft_store_excl")
    val fs = ArtifactStore.fs(base, shimConf)

    // (a) basic chain: each successor builds FROM its parent
    val v1 = ArtifactStore.commitExclusive(fs, base) { (parent, d) =>
      assert(parent.isEmpty); put(fs, d, "data", "one")
    }
    assert(ArtifactStore.currentDir(fs, base).contains(v1))
    val v2 = ArtifactStore.commitExclusive(fs, base) { (parent, d) =>
      put(fs, d, "data", read(fs, new Path(parent.get, "data")) + "+two")
    }
    assert(read(fs, new Path(v2, "data")) == "one+two")
    assert(!ArtifactStore.activeClaim(fs, base), "claim must be released")

    // (b) a LIVE foreign claim blocks us; when its owner publishes, we
    // rebase on the published version instead of forking from v2
    val claim3 = new Path(base, "_graft_claim_0000000003")
    put(fs, base, "_graft_claim_0000000003", "other-tag")
    var sibPublished = false
    val v4 = ArtifactStore.commitExclusive(fs, base,
      waitMs = _ => {
        // the sibling's publish happens while we wait on its claim
        if (!sibPublished) {
          sibPublished = true
          val sib = new Path(base, "v0000000003_500_other")
          fs.mkdirs(sib)
          put(fs, sib.toString, "data",
            read(fs, new Path(v2, "data")) + "+other")
          fs.create(new Path(sib, ArtifactStore.Marker), true).close()
          fs.delete(claim3, false)
        }
      }) { (parent, d) =>
      put(fs, d, "data", read(fs, new Path(parent.get, "data")) + "+mine")
    }
    assert(v4.getName.startsWith("v0000000004_"))
    assert(read(fs, new Path(v4, "data")) == "one+two+other+mine",
      "must rebase on the sibling's committed version, not its parent")

    // (c) a STALE foreign claim (crashed claimant) is reaped, not waited on
    put(fs, base, "_graft_claim_0000000005", "dead-tag")
    fs.setTimes(new Path(base, "_graft_claim_0000000005"),
      System.currentTimeMillis() - 60000L, -1)
    val v5 = ArtifactStore.commitExclusive(fs, base, claimStaleMs = 5000L,
      waitMs = _ => fail("must reap the stale claim, not wait on it")) {
      (parent, d) =>
        put(fs, d, "data", read(fs, new Path(parent.get, "data")) + "+five")
    }
    assert(read(fs, new Path(v5, "data")) == "one+two+other+mine+five")

    // (d) presumed-dead claimant: our claim is reaped and recycled
    // MID-BUILD; we must retract the unpublished stage and rebase — both
    // our rows and the recycler's rows survive in the final lineage
    var attempt = 0
    val v7 = ArtifactStore.commitExclusive(fs, base) { (parent, d) =>
      attempt += 1
      if (attempt == 1) {
        // a reaper deletes our claim (thinks us dead); a sibling
        // re-claims the seq, publishes it, and releases
        fs.delete(new Path(base, "_graft_claim_0000000006"), false)
        val sib = new Path(base, "v0000000006_500_other2")
        fs.mkdirs(sib)
        put(fs, sib.toString, "data",
          read(fs, new Path(parent.get, "data")) + "+other2")
        fs.create(new Path(sib, ArtifactStore.Marker), true).close()
      }
      put(fs, d, "data", read(fs, new Path(parent.get, "data")) + "+mine2")
    }
    assert(attempt == 2, "first build must be retracted, second rebased")
    assert(v7.getName.startsWith("v0000000007_"))
    assert(read(fs, new Path(v7, "data")) ==
      "one+two+other+mine+five+other2+mine2",
      "retract-and-rebase must preserve BOTH writers' increments")
    // the retracted attempt-1 stage is uncommitted and invisible
    assert(ArtifactStore.versions(fs, base).map(_._1).max == 7L)

    // (e) vacuum reaps stale claims but never a live one
    put(fs, base, "_graft_claim_0000000008", "stale")
    fs.setTimes(new Path(base, "_graft_claim_0000000008"),
      System.currentTimeMillis() - 60000L, -1)
    put(fs, base, "_graft_claim_0000000009", "live")
    ArtifactStore.vacuum(fs, base, keep = 1, staleMs = 5000L)
    assert(!fs.exists(new Path(base, "_graft_claim_0000000008")),
      "stale claim survived vacuum")
    assert(fs.exists(new Path(base, "_graft_claim_0000000009")),
      "live claim reaped — would kill an in-flight committer")
    assert(ArtifactStore.activeClaim(fs, base))
    fs.delete(new Path(base, "_graft_claim_0000000009"), false)
    assert(!ArtifactStore.activeClaim(fs, base))
  }

  test("same-seq race: both land committed; readers agree on one deterministic winner") {
    val base = freshBase("graft_store_race")
    val fs = ArtifactStore.fs(base, shimConf)
    // two committers that each saw "no versions" stage under the same
    // seq with different tags — plant both outcomes directly
    for (tag <- Seq("100_aaa", "100_zzz")) {
      val d = s"$base/v0000000001_$tag"
      fs.mkdirs(new Path(d))
      put(fs, d, "data", tag)
      put(fs, d, ArtifactStore.Marker, "")
    }
    val cur = ArtifactStore.currentDir(fs, base).get
    assert(cur.getName == "v0000000001_100_zzz",
      s"tie-break must be deterministic (tag-max), got $cur")
    // the winner is what a subsequent commit builds on top of
    val v2 = ArtifactStore.commit(fs, base)(d => put(fs, d, "data", "next"))
    assert(v2.getName.startsWith("v0000000002_"))
  }

  test("vacuum staleness runs on the STORE's clock: 1h skew reclaims no live stage") {
    // store clock one hour BEHIND the reclaimer's: every store mtime
    // looks an hour old from here. A local-clock vacuum would reclaim
    // every in-flight stage and claim on sight; measuring "now" off the
    // same skewed clock (ArtifactStore.storeNow) cancels the skew.
    val c = new org.apache.hadoop.conf.Configuration()
    c.set("fs.skewclock.impl", classOf[SkewedClockFileSystem].getName)
    c.set("fs.skewclock.impl.disable.cache", "true")
    val base = "skewclock:" +
      java.nio.file.Files.createTempDirectory("graft_skew").toString + "/artifact"
    val fs = new Path(base).getFileSystem(c)
    ArtifactStore.commit(fs, base)(d => put(fs, d, "data", "v1"))
    // a FRESH uncommitted stage (sibling mid-build) and a fresh claim
    val stage = new Path(base, "v0000000002_inflight")
    fs.mkdirs(stage)
    put(fs, base, "_graft_claim_2", "")
    val claim = new Path(base, "_graft_claim_2")
    // sanity: the skew is real — both look ancient from the local clock
    assert(System.currentTimeMillis() - fs.getFileStatus(stage).getModificationTime
      > 30 * 60 * 1000L, "shim clock skew did not apply")

    ArtifactStore.vacuum(fs, base, keep = 1, staleMs = 10 * 60 * 1000L)
    assert(fs.exists(stage), "skewed clock reclaimed a LIVE in-flight stage")
    assert(fs.exists(claim), "skewed clock reaped a live claim")
    // staleMs = 0 still reclaims on request (both clocks agree age >= 0)
    ArtifactStore.vacuum(fs, base, keep = 1, staleMs = 0L)
    assert(!fs.exists(stage) && !fs.exists(claim))
  }
}

/** Object-store shim whose clock runs one hour BEHIND the local JVM's:
  * every reported mtime is shifted back, exactly the skew that makes a
  * wall-clock staleness horizon dangerous (VERDICT r10 residual #3). */
class SkewedClockFileSystem extends RawLocalFileSystem {
  import org.apache.hadoop.fs.FileStatus
  override def getScheme: String = "skewclock"
  override def getUri: java.net.URI = java.net.URI.create("skewclock:///")
  private def shift(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime - 60 * 60 * 1000L, st.getPath)
  // getFileStatus only: RawLocalFileSystem.listStatus delegates through
  // getFileStatus per entry, so shifting both would double the skew
  override def getFileStatus(p: Path): FileStatus = shift(super.getFileStatus(p))
}
