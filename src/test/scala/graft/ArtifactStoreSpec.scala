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
}
