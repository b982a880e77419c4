package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store-safe commit protocol for persisted derived artifacts
  * (IVF/RP-LSH/quant indexes, dedup labelings, the [[DedupIndex]]
  * tables): versioned directories published by a commit-marker file.
  *
  * Why not rename: the reference's storage layer is an object store
  * (`Utils/S3.py:41-133`), where a directory "rename" is a non-atomic
  * client-side copy+delete and `java.io.File` does not exist. Every
  * protocol step here is expressed over Hadoop [[FileSystem]] using only
  * `mkdirs` / `create` / `listStatus` / `getFileStatus` / `delete` —
  * operations that are atomic-enough on both POSIX and S3-class stores.
  * ArtifactStoreSpec drives the whole lifecycle through a shim
  * FileSystem whose `rename` throws, proving the independence.
  *
  * The protocol:
  *  - an artifact lives under a BASE directory as immutable VERSION
  *    directories `v{seq}_{tag}` (zero-padded seq; tag = pid+nanos so
  *    concurrent committers never share a stage dir);
  *  - a writer stages a new version by building ALL files inside its
  *    private version dir, then PUTs the empty `_GRAFT_COMMITTED` marker
  *    LAST — a single small object write, atomic on S3 (and readers of
  *    a marker are guaranteed to see the data files: S3 is
  *    strongly-consistent read-after-write since 2020, POSIX trivially);
  *  - readers resolve "current" by listing the base and taking the
  *    committed version with the highest (seq, tag) — a dir without the
  *    marker is a crash leftover or an in-flight build and is invisible;
  *  - nothing is ever mutated or deleted during publication, so a
  *    reader mid-scan of the previous version is never pulled out from
  *    under (the flaw in a swap-in-place protocol); [[vacuum]] reclaims
  *    superseded versions and stale uncommitted stages later, after a
  *    quiescent period — exactly the snapshot-expiry discipline every
  *    table format (Iceberg/Delta) ships.
  *
  * Concurrent committers may race to the same seq; their tags differ,
  * both land as complete committed versions, and readers pick the same
  * deterministic winner. The loser's copy is identical by construction
  * for build-once artifacts (same stamp ⇒ same input) and is vacuumed
  * later. Job-INTERNAL file commit (Spark's task-attempt dance inside
  * the staged version dir) belongs to the configured output committer —
  * pluggable per store, e.g. the S3A committers — and is deliberately
  * out of this protocol's scope: what must never depend on rename is
  * the publication step, and here it does not.
  */
object ArtifactStore {

  /** Marker object naming a version directory committed. */
  val Marker = "_GRAFT_COMMITTED"

  private val VersionRx = """v(\d+)_(.+)""".r

  /** The Hadoop configuration to resolve filesystems with: the active
    * session's (it carries `fs.*.impl` overrides and store credentials),
    * else a vanilla one (plain local paths still resolve). */
  def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(path: String, conf: Configuration = hadoopConf()): FileSystem =
    new Path(path).getFileSystem(conf)

  /** Store-agnostic existence check (replaces `java.io.File.exists` in
    * artifact completeness predicates). */
  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  /** Committed versions under `base`, current first (highest seq, tag
    * as the deterministic tie-break). Uncommitted dirs are invisible. */
  def versions(f: FileSystem, base: String): Seq[(Long, String, Path)] = {
    val b = new Path(base)
    if (!f.exists(b)) Nil
    else f.listStatus(b).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName match {
          case VersionRx(seq, tag) if f.exists(new Path(st.getPath, Marker)) =>
            Some((seq.toLong, tag, st.getPath))
          case _ => None
        }
      }
      .sortWith { case ((s1, t1, _), (s2, t2, _)) =>
        s1 > s2 || (s1 == s2 && t1 > t2)
      }
  }

  /** The current committed version directory, if any. */
  def currentDir(f: FileSystem, base: String): Option[Path] =
    versions(f, base).headOption.map(_._3)

  /** Stage-and-publish a new version: `build` materializes the artifact
    * into a fresh private version directory, then the commit marker is
    * PUT last. Returns the committed version dir. A `build` failure
    * leaves only an uncommitted (invisible) stage dir for [[vacuum]]. */
  def commit(f: FileSystem, base: String)(build: String => Unit): Path = {
    val next = versions(f, base).headOption.map(_._1 + 1L).getOrElse(1L)
    val tag = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    // fully-qualified from the start, so the returned path compares
    // equal to what listStatus-backed readers ([[versions]]) report
    val dir = f.makeQualified(new Path(base, f"v$next%010d_$tag"))
    f.mkdirs(dir)
    build(dir.toString)
    f.create(new Path(dir, Marker), true).close()
    dir
  }

  /** Reclaim superseded committed versions beyond the newest `keep` and
    * uncommitted stage dirs older than `staleMs` (a young uncommitted
    * dir may be a sibling's build about to publish — left alone). Not
    * part of publication: run after a quiescent period, when no reader
    * can still hold the superseded snapshot. */
  def vacuum(f: FileSystem, base: String, keep: Int = 1,
      staleMs: Long = 10 * 60 * 1000L): Unit = {
    val vs = versions(f, base)
    vs.drop(math.max(keep, 1)).foreach { case (_, _, p) => f.delete(p, true) }
    val committed = vs.map(_._3.getName).toSet
    val b = new Path(base)
    if (f.exists(b)) f.listStatus(b).foreach { st =>
      val young = System.currentTimeMillis() - st.getModificationTime < staleMs
      if (st.isDirectory && !committed.contains(st.getPath.getName) && !young)
        st.getPath.getName match {
          case VersionRx(_, _) => f.delete(st.getPath, true)
          case _               => () // not ours — never touch
        }
    }
  }
}
