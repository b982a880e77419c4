package graft.sources

/** Build-once / probe-many guard for persisted derived artifacts (IVF
  * index, dedup cluster labeling): many JVMs (Verify, Bench, tests) want
  * the same expensive artifact for the same source data; exactly one
  * should build it, nobody may observe a half-written copy, and stale
  * data must never be served.
  *
  *  - Staleness: the caller passes a `stamp` fingerprinting the SOURCE
  *    (path + size + mtime). The stamp IS the cache key and names the
  *    artifact root, so regenerated source routes to a fresh build.
  *  - Atomicity: publication goes through [[ArtifactStore]]'s
  *    versioned-dir + commit-marker protocol — the artifact is built
  *    into a private version directory and published by a single
  *    marker-file PUT, never by a directory rename (which object
  *    stores cannot do atomically). Concurrent builders each publish a
  *    complete copy; readers resolve one deterministic winner.
  *  - Recovery: a crash mid-build leaves an UNCOMMITTED version dir,
  *    which is invisible to every reader and reclaimed by
  *    [[ArtifactStore.vacuum]]; a committed-but-corrupt version (the
  *    caller's `complete` check fails) is superseded by a fresh build,
  *    not repaired in place.
  */
object BuildOnce {

  private val cache = new scala.collection.concurrent.TrieMap[String, String]()

  /** Root directory family for stamped artifacts: the active session's
    * `spark.graft.artifacts.dir` (an object-store URI in production),
    * else the local tmpdir (test JVMs on one box sharing builds). */
  private def artifactsRoot(): String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(_.conf.getOption("spark.graft.artifacts.dir"))
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Directory containing the artifact for `stamp`; built via `build` at
    * most once per stamp per JVM, shared across JVMs through the store.
    * ALWAYS returns a directory holding a complete artifact — the
    * current committed version if it passes `complete`, else a freshly
    * built and committed one.
    *
    * @param prefix   artifact family name (root directory name prefix)
    * @param stamp    source fingerprint — recompute on every call, never
    *                 memoize it per path (a memoized stamp is exactly the
    *                 stale-cache bug this exists to prevent)
    * @param complete given a version directory, is the artifact usable?
    *                 (corruption guard on top of the commit marker)
    * @param build    materialize the artifact into the given fresh dir
    */
  def dir(prefix: String, stamp: String, complete: String => Boolean)(
      build: String => Unit): String =
    cache.getOrElseUpdate(s"$prefix|$stamp", {
      val root = s"${artifactsRoot()}/${prefix}_" +
        java.security.MessageDigest.getInstance("MD5").digest(stamp.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
      val f = ArtifactStore.fs(root)
      ArtifactStore.currentDir(f, root) match {
        case Some(v) if complete(v.toString) => v.toString
        case _ => ArtifactStore.commit(f, root)(build).toString
      }
    })

  /** Source fingerprint for a driver-table file: path + size + mtime,
    * plus an ALGORITHM token (ADVICE r06): artifacts in the shared root
    * outlive code changes, so a change to e.g. MinHash banding or the
    * verification threshold must route to a fresh artifact directory —
    * the stamp carries the parameters, not just the source identity.
    * Resolved through Hadoop [[org.apache.hadoop.fs.FileSystem]] so an
    * object-store source URI fingerprints the same way a local file
    * does. */
  def stampOf(path: String, algoToken: String = ""): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val st =
      try Some(ArtifactStore.fs(path).getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    s"$path|${st.map(_.getLen).getOrElse(0L)}|" +
      s"${st.map(_.getModificationTime).getOrElse(0L)}|$algoToken"
  }
}
