package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{ArtifactStore, DedupIndex, Tables}

/** One-command operational maintenance across artifact roots (VERDICT
  * r10 next-round #8): the lifecycle pieces — [[DedupIndex.compact]],
  * [[DedupIndex.rebuildBloom]], [[ArtifactStore.vacuum]] — exist as
  * library calls; this main is the nightly-cron form that strings them
  * together, the operational sibling of [[Explain]].
  *
  * `runMain graft.Maintain <root>...` walks each root:
  *  - a USER-OWNED INDEX root (committed version carrying the index
  *    metadata file): compact into a fresh version (re-distinct, same
  *    bucket layout), rebuild its Bloom sidecar from the compacted hash
  *    table IF one exists (never conjures a sidecar for an index that
  *    doesn't use the gate), then vacuum both the index's and the
  *    sidecar's superseded versions and stale claims/stages;
  *  - any other [[ArtifactStore]] base: vacuum only (build-once
  *    artifacts are immutable per stamp — there is nothing to compact).
  *
  * Ordering inside a root matters and is fixed here: compact FIRST
  * (publishes the successor), bloom rebuild SECOND (describes the
  * successor's table), vacuum LAST (reclaims what the first two
  * superseded, after they are durably current). Every publish goes
  * through the commit claim, so a concurrent absorber is fenced the
  * same way it is against any compaction.
  *
  * Knobs (env): SPARK_GRAFT_KEEP (versions kept per root, default 1),
  * SPARK_GRAFT_STALE_MS (staleness horizon for uncommitted stages and
  * crashed claims, default 10 min — 0 in tests). Output: one JSON line
  * per root plus a closing summary line, same stdout discipline as
  * [[Bench]].
  */
object Maintain {

  /** What maintenance did to one root. */
  final case class Report(root: String, kind: String,
      compacted: Boolean, bloomRebuilt: Boolean,
      versionsBefore: Int, versionsAfter: Int)

  /** Maintain one root (library form — MaintainSpec drives this). */
  def maintainRoot(s: SparkSession, root: String,
      keep: Int = 1, staleMs: Long = 10 * 60 * 1000L): Report = {
    val f = ArtifactStore.fs(root)
    val before = ArtifactStore.versions(f, root).length
    if (DedupIndex.isIndexRoot(root)) {
      val idx = DedupIndex.compact(s, DedupIndex.open(s, root))
      val bloomBase = s"$root/_bloom"
      val hasBloom = ArtifactStore.currentDir(f, bloomBase).isDefined
      if (hasBloom) DedupIndex.rebuildBloom(s, idx)
      ArtifactStore.vacuum(f, root, keep, staleMs)
      if (hasBloom) ArtifactStore.vacuum(f, bloomBase, keep, staleMs)
      Report(root, "index", compacted = true, bloomRebuilt = hasBloom,
        before, ArtifactStore.versions(f, root).length)
    } else {
      ArtifactStore.vacuum(f, root, keep, staleMs)
      Report(root, "artifact", compacted = false, bloomRebuilt = false,
        before, ArtifactStore.versions(f, root).length)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Maintain <artifactRoot>...")
    val keep = sys.env.getOrElse("SPARK_GRAFT_KEEP", "1").toInt
    val staleMs = sys.env.getOrElse("SPARK_GRAFT_STALE_MS",
      (10 * 60 * 1000L).toString).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jstr(x: String): String =
      "\"" + x.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val reports = args.toSeq.map { root =>
      val r = maintainRoot(spark, root, keep, staleMs)
      println(s"""{"root":${jstr(r.root)},"kind":"${r.kind}","compacted":${r.compacted},""" +
        s""""bloom_rebuilt":${r.bloomRebuilt},"versions":{"before":${r.versionsBefore},"after":${r.versionsAfter}}}""")
      r
    }
    spark.stop()
    println(s"""{"metric":"maintained","value":${reports.length},"unit":"roots"}""")
  }
}
