package graft.sources

/** Build-once / probe-many guard for persisted derived artifacts (IVF
  * index, dedup cluster labeling): many JVMs (Verify, Bench, tests) want
  * the same expensive artifact for the same source data; exactly one
  * should build it, nobody may observe a half-written copy, and stale
  * data must never be served.
  *
  *  - Staleness: the caller passes a `stamp` fingerprinting the SOURCE
  *    (path + size + mtime). The stamp IS the cache key and names the
  *    artifact directory, so regenerated source routes to a fresh build.
  *  - Atomicity: the artifact is built into a process-private sibling dir
  *    and atomically renamed into place (`ATOMIC_MOVE` = rename(2) inside
  *    one filesystem). Concurrent builders each produce a complete copy;
  *    one rename wins, losers delete theirs and use the winner's.
  *  - Recovery: an existing-but-incomplete directory (crash of an older
  *    build-in-place version) fails the caller's `complete` check and is
  *    cleared before the rename.
  */
object BuildOnce {

  private val cache = new scala.collection.concurrent.TrieMap[String, String]()

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
  }

  /** Clearing an incomplete leftover is only safe when it cannot be a
    * build a sibling JVM is completing RIGHT NOW: a racer's rename lands
    * a fresh directory, a crash leftover is old. Anything younger than
    * this is left alone (the caller falls back to its private build). */
  private val staleAfterMs = 10 * 60 * 1000L

  /** Directory containing the artifact for `stamp`; built via `build` at
    * most once per stamp across JVMs. ALWAYS returns a directory holding
    * a complete artifact — normally the shared `base`; in the rare
    * race/corruption corner where `base` cannot be trusted, this JVM's
    * private build directory is returned instead (correctness over
    * sharing).
    *
    * @param prefix   artifact family name (directory name prefix in tmp)
    * @param stamp    source fingerprint — recompute on every call, never
    *                 memoize it per path (a memoized stamp is exactly the
    *                 stale-cache bug this exists to prevent)
    * @param complete given the final directory, is the artifact usable?
    * @param build    materialize the artifact into the given fresh dir
    */
  def dir(prefix: String, stamp: String, complete: String => Boolean)(
      build: String => Unit): String =
    cache.getOrElseUpdate(s"$prefix|$stamp", {
      val base = s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
        java.security.MessageDigest.getInstance("MD5").digest(stamp.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
      if (complete(base)) base
      else {
        // clear an incomplete leftover ONLY if it is old — a young one may
        // be a sibling's build about to be renamed in (deleting a possibly
        // fresh complete artifact under a reader would break its lazy scan)
        val f = new java.io.File(base)
        if (f.exists() && System.currentTimeMillis() - f.lastModified() > staleAfterMs)
          rm(f)
        val tmp = s"$base.build_${ProcessHandle.current().pid()}_${System.nanoTime()}"
        build(tmp)
        try {
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(base),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          base
        } catch {
          // only an existing-target failure means "the slot is occupied"
          // (Linux surfaces it as a generic FileSystemException("Directory
          // not empty"), so the occupancy check is on the target itself);
          // anything else — permissions, I/O — must surface, not silently
          // discard the finished build
          case e: java.nio.file.FileSystemException
              if e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
                e.isInstanceOf[java.nio.file.DirectoryNotEmptyException] ||
                new java.io.File(base).exists() =>
            if (complete(base)) { rm(new java.io.File(tmp)); base }
            else tmp // base is occupied but unusable: serve our private build
        }
      }
    })

  /** Source fingerprint for a driver-table file: path + size + mtime,
    * plus an ALGORITHM token (ADVICE r06): artifacts in the shared tmpdir
    * outlive code changes, so a change to e.g. MinHash banding or the
    * verification threshold must route to a fresh artifact directory —
    * the stamp carries the parameters, not just the source identity. */
  def stampOf(path: String, algoToken: String = ""): String = {
    val f = new java.io.File(path)
    s"$path|${f.length()}|${f.lastModified()}|$algoToken"
  }
}
