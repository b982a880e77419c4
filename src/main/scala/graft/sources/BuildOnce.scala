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

  /** Directory containing the artifact for `stamp`; built via `build` at
    * most once per stamp across JVMs.
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
      if (!complete(base)) {
        rm(new java.io.File(base))
        val tmp = s"$base.build_${ProcessHandle.current().pid()}_${System.nanoTime()}"
        build(tmp)
        try java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(base),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.FileSystemException =>
            // a sibling JVM won the rename; its artifact is complete
            rm(new java.io.File(tmp))
        }
      }
      base
    })

  /** Source fingerprint for a driver-table file: path + size + mtime. */
  def stampOf(path: String): String = {
    val f = new java.io.File(path)
    s"$path|${f.length()}|${f.lastModified()}"
  }
}
