package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY §2.2): hive-partitioned batch writes (K2), event-time
  * partitioned writes (K3), local/debug dumps (K7), window-state documents
  * (K9), batch slicing (L6 `maxRecordsPerFile`).
  *
  * Spark-first: partitioned parquet + the job commit protocol replace the
  * reference's hand-built S3 keys, metadata envelopes, and upload threads
  * (`Utils/S3.py:57-217`) — partition directories ARE the hive key, the
  * task scheduler IS the thread pool, and `_SUCCESS` + atomic rename are
  * the transactional load (K6 analog on files). */
object Writers {

  /** K2: ingest-date partitioned batch write — partition columns derived
    * from a timestamp, hive layout `year=/month=/day=`. Partition pruning
    * on read-back is what makes the 100 TB scan cheap; `maxRecordsPerFile`
    * is the reference's 200-rows-per-object batch slicing (L6). */
  def partitionedByDate(df: DataFrame, tsCol: String, path: String,
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df
      .withColumn("year", date_format(col(tsCol), "yyyy"))
      .withColumn("month", date_format(col(tsCol), "MM"))
      .withColumn("day", date_format(col(tsCol), "dd"))
      .write.mode("overwrite")
      // dynamic: overwrite only the partitions THIS batch touches — under
      // the default static mode an incremental run would truncate every
      // previously landed year=/month=/day= directory
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month", "day")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .parquet(path)
  }

  /** K3: event-time partitioned write — same layout, but the partition
    * date comes from the EVENT's timestamp (late data lands in its event
    * partition, not the ingest partition). */
  def partitionedByEventTime(df: DataFrame, eventTsCol: String, path: String): Unit =
    partitionedByDate(df, eventTsCol, path)

  /** Range-clustered data layout: `repartitionByRange` on the cluster key
    * + in-partition sort before the write, so each output file covers a
    * DISJOINT key range and its parquet min/max footer stats let a
    * filtered read skip whole files/row-groups. This is the layout move
    * that turns a 100 TB "find these users" scan into a handful of file
    * reads — partitioning (K2) prunes directories by date; range
    * clustering prunes files WITHIN a partition by key. The range
    * exchange samples the key distribution, so skew produces balanced
    * files without manual bucketing. */
  def clusteredByRange(df: DataFrame, keyCol: String, path: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)

  /** Morton/Z-value of two non-negative long columns: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1. Pure codegen'd shift/and/or
    * chain — `bits` ≤ 31 keeps the interleave inside a long. Nearby
    * (a, b) points get nearby z-values, which is the whole trick:
    * sorting by ONE derived key clusters BOTH dimensions.
    *
    * Input DOMAIN is [0, 2^bits) per column (ADVICE r07): bits at or
    * above position `bits` are silently ignored, so out-of-domain keys
    * alias to the same z-prefix and quietly degrade 2-D skipping (output
    * VALUES stay correct — `_z` is layout-only — but the layout stops
    * clustering). [[clusteredByZOrder]] derives `bits` from the real key
    * range and rejects negatives, so the sink never relies on the
    * caller knowing this. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Z-order clustered write: [[clusteredByRange]] generalized to TWO
    * scan dimensions. A single-key range layout makes the second
    * dimension useless for skipping (every file spans its full range);
    * range-partitioning + sorting on the interleaved [[zValue]] bounds
    * each file to a small rectangle in (a, b) space, so a scan filtered
    * on EITHER or BOTH dimensions prunes by per-file min/max footers.
    * ScaleTechniquesSpec measures the claim: candidate files for a 2-D
    * box predicate, z-order vs linear layout, from the real parquet
    * footprints. At 100 TB this is the write-side complement to
    * partition pruning — layout chosen once at load time, paid back by
    * every selective scan after. */
  def clusteredByZOrder(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int): Unit = {
    // derive the interleave width from the REAL key range (ADVICE r07):
    // a fixed width silently aliases keys ≥ 2^bits onto one z-prefix and
    // degrades skipping; negatives would interleave sign bits. One
    // bounded min/max aggregation — cheap next to the write it shapes.
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    if (r.isNullAt(0)) { // empty input: nothing to cluster, write as-is
      df.write.mode("overwrite").parquet(path)
    } else {
      val lo = math.min(r.getLong(0), r.getLong(2))
      val hi = math.max(r.getLong(1), r.getLong(3))
      require(lo >= 0, s"z-order keys must be non-negative (min($colA,$colB)=$lo)")
      require(hi < (1L << 31),
        s"z-order interleave supports keys < 2^31 (max($colA,$colB)=$hi)")
      val bits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(hi))
      df.withColumn("_z", zValue(col(colA), col(colB), bits))
        .repartitionByRange(numFiles, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Outcome of a [[deleteWhere]]: how much of the dataset the delete
    * actually touched (the scale claim, asserted by WritersSpec). */
  final case class DeleteStats(filesTotal: Int, filesRewritten: Int,
      rowsDeleted: Long)

  /** Above this many distinct keys, [[deleteWhereKeys]] stops building a
    * literal IN predicate (megabyte expression trees, driver-held lists)
    * and discovers hit files with a semi-join instead. Below it, the
    * IN-list is the better plan: literals push into the parquet scan,
    * so min/max footers skip files without reading data pages. */
  val DeleteInListLimit = 10000

  /** Targeted delete (right-to-be-forgotten / opt-out removal) over a
    * landed flat parquet dataset: rewrite ONLY the files that contain a
    * dropped key; every other file stays byte-identical on disk. This is
    * the K5 overwrite/delete semantics at corpus scale — deleting a few
    * thousand documents from 100 TB must not rewrite 100 TB.
    * Bounded-list convenience form of [[deleteWhereKeys]]. */
  def deleteWhere(spark: SparkSession, path: String, keyCol: String,
      dropKeys: Seq[Long]): DeleteStats = {
    import spark.implicits._
    deleteWhereKeys(spark, path, keyCol, dropKeys.toDF(keyCol))
  }

  /** Set-valued targeted delete: the dropped keys arrive as a DataFrame
    * (single key column), so a 10^6-key right-to-be-forgotten sweep
    * never materializes on the driver or in an expression tree.
    *
    * How the touched set stays small: discovery runs `keyCol IN (...)`
    * when the key set is bounded (≤ `inListLimit` — literals push into
    * the parquet scan, and on a [[clusteredByRange]]/[[clusteredByZOrder]]
    * layout the per-file min/max footers exclude almost every file
    * without reading data pages), else a LEFT SEMI join against the
    * distinct key frame (shuffle-hash/broadcast as Catalyst sizes it;
    * on the clustered layout dynamic pruning still bounds the scan).
    * Survivor files are pinned by `input_file_name()` — the driver
    * collects hit file PATHS, never rows.
    *
    * The rewrite reads just the hit files, drops the keyed rows (the
    * deleted count folds into the SAME pass via `observe` — no second
    * scan), writes replacements to a staging dir, MOVES THE REPLACEMENTS
    * IN FIRST under fresh collision-free names, and only then deletes
    * the originals. A crash inside the swap window therefore DUPLICATES
    * retained rows (both copies present) but never loses one — the same
    * at-least-once choice [[graft.streaming.Streams]]' index-absorb loop
    * documents; exact dedup downstream reclaims duplicates, nothing can
    * reclaim a lost row. An interrupted swap is detectable by the
    * leftover `.delete_*` staging dir beside the dataset.
    *
    * All file I/O goes through Hadoop [[org.apache.hadoop.fs.FileSystem]]
    * — no `java.io.File`, so an object-store dataset URI works; the only
    * rename is PER-FILE into the dataset directory (on S3-class stores a
    * copy+delete whose copy is atomic per object — it is DIRECTORY
    * swaps, not single-object moves, that object stores cannot do; cf.
    * [[graft.sources.ArtifactStore]] for the directory-level protocol).
    *
    * MUTATOR COORDINATION: the whole discovery→write→swap window runs
    * under [[graft.sources.ArtifactStore.withRootClaim]] — two
    * claim-aware mutators (this, [[upsertByKey]], [[compactSmallFiles]],
    * incl. a cron'd [[graft.Maintain]]) serialize on the root instead of
    * interleaving their delete phases; a mutator that cannot get the
    * root within `claimMaxWaitMs` fails fast. Plain READERS never block,
    * and may still see a partially-swapped directory (the same caveat
    * every non-transactional table format carries).
    *
    * @param onBeforeDeleteOriginals test seam: runs between the move-in
    *        and the delete phases (crash-injection specs prove the
    *        no-loss ordering) */
  def deleteWhereKeys(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame, inListLimit: Int = DeleteInListLimit,
      onBeforeDeleteOriginals: () => Unit = () => (),
      claimMaxWaitMs: Long = 10 * 60 * 1000L): DeleteStats = {
    val fs = graft.sources.ArtifactStore.fs(path)
    graft.sources.ArtifactStore.withRootClaim(fs, path,
        maxWaitMs = claimMaxWaitMs) {
    val dataDir = new org.apache.hadoop.fs.Path(path)
    val allFiles = fs.listStatus(dataDir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val kc = keys.columns match {
      case Array(one) => one
      case cols => throw new IllegalArgumentException(
        s"keys frame must have exactly the key column, got ${cols.mkString(",")}")
    }
    val distinctKeys = keys.select(col(kc)).distinct()
    val (affected, inList) = hitFiles(spark, path, keyCol, distinctKeys, inListLimit)
    if (affected.isEmpty) DeleteStats(allFiles.length, 0, 0L) else {

    val affectedDf = spark.read.parquet(affected: _*)
    // mark-and-filter in ONE pass: the deleted count rides on the kept
    // write via the Observation API instead of a second scan of the hit
    // files. IN-list marking when bounded (stays codegen'd); left-outer
    // mark join otherwise.
    val marked = inList match {
      case Some(lits) => affectedDf.withColumn("_hit", col(keyCol).isin(lits: _*))
      case None =>
        affectedDf.join(
          distinctKeys.withColumnRenamed(kc, "_delete_key").withColumn("_hit", lit(true)),
          col(keyCol) === col("_delete_key"), "left_outer").drop("_delete_key")
    }
    val tag = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val obs = org.apache.spark.sql.Observation(s"graft_delete_$tag")
    val kept = marked
      .observe(obs, sum(when(col("_hit"), 1L).otherwise(0L)).as("deleted"))
      .filter(!coalesce(col("_hit"), lit(false))).drop("_hit")
    val tmp = new org.apache.hadoop.fs.Path(s"$path.delete_$tag")
    kept.write.parquet(tmp.toString)
    val deleted = obs.get("deleted") match {
      case null => 0L
      case n: Number => n.longValue()
    }
    // ---- swap: replacements IN first, originals out second ----------
    fs.listStatus(tmp)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.foreach { case (st, i) =>
        fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(dataDir, s"part-rw$i-$tag.parquet"))
      }
    onBeforeDeleteOriginals()
    affected.foreach(u => fs.delete(new org.apache.hadoop.fs.Path(u), false))
    fs.delete(tmp, true)
    DeleteStats(allFiles.length, affected.length, deleted)
    }
    }
  }

  /** Hit-file discovery for [[deleteWhereKeys]]: the file URIs holding at
    * least one dropped key, plus the literal list when the IN-list fast
    * path applied (`None` = semi-join path; the spec pins that a 10^5-key
    * delete never builds a 10^5-wide IN). */
  private[graft] def hitFiles(spark: SparkSession, path: String, keyCol: String,
      distinctKeys: DataFrame, inListLimit: Int): (Seq[String], Option[Seq[Column]]) = {
    val (files, detail) = hitFilesDetailed(spark, path, keyCol, distinctKeys, inListLimit)
    (files, detail.map(_._1))
  }

  /** [[hitFiles]] plus, on the IN-list path, the collected key VALUES —
    * which on that path are the batch's COMPLETE distinct key set (the
    * bounded peek proved there are ≤ `inListLimit` of them), so a caller
    * can derive its distinct-key count and null-key presence from data
    * already on the driver instead of paying a dedicated aggregation job
    * ([[upsertByKey]]'s round-21 validation fusion). */
  private[graft] def hitFilesDetailed(spark: SparkSession, path: String,
      keyCol: String, distinctKeys: DataFrame, inListLimit: Int)
      : (Seq[String], Option[(Seq[Column], IndexedSeq[Any])]) = {
    val data = spark.read.parquet(path)
    val kc = distinctKeys.columns.head
    // bounded peek: collects at most limit+1 keys to pick the plan shape
    val sample = distinctKeys.limit(inListLimit + 1).collect()
    val (fileFrame, lits) =
      if (sample.length <= inListLimit) {
        // literal path: filter FIRST (pushes into the scan — min/max
        // footers skip files), project the file name after
        val vals = sample.toIndexedSeq.map(_.get(0))
        val ls = vals.map(lit(_))
        (data.filter(col(keyCol).isin(ls: _*))
          .select(input_file_name().as("f")), Some((ls, vals)))
      } else {
        // join path: capture the file name BEFORE the join —
        // `input_file_name()` is only valid on the scan side of a
        // shuffle; projected after a sort-merge join it returns ""
        // (precisely the >broadcast-threshold key sets this path is
        // for). The scan reads one column; no footer skipping without
        // literals, which is the honest cost of an unbounded key set.
        val scanned = data.select(col(keyCol).as("_delete_probe"),
          input_file_name().as("f"))
        (scanned.join(distinctKeys,
          scanned("_delete_probe") === distinctKeys(kc), "left_semi")
          .select(col("f")), None)
      }
    val files = fileFrame.distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    (files, lits)
  }

  /** Outcome of an [[upsertByKey]]: files touched and the replace/insert
    * split (replaced + inserted = the update batch's row count). */
  final case class UpsertStats(filesTotal: Int, filesRewritten: Int,
      rowsReplaced: Long, rowsInserted: Long)

  /** Keyed MERGE (upsert) into a landed flat parquet dataset: every row of
    * `updates` whose key exists in the dataset REPLACES the stored row;
    * keys the dataset has never seen are APPENDED. The file-level sibling
    * of the reference's `ON DUPLICATE KEY UPDATE` load
    * (`Utils/sql.py:79-99`, exercised against live Derby by
    * [[JdbcSink]]) — at corpus scale the nightly "re-crawl changed
    * players" batch must not rewrite 100 TB to refresh 10^5 rows.
    *
    * Scale shape (shares [[deleteWhereKeys]]' machinery): hit files are
    * discovered by [[hitFiles]] (pushed-down IN under the literal limit —
    * min/max footers skip files on a clustered layout — else a left-semi
    * join; never a driver-side key list past the bound). Only hit files
    * are rewritten; the update batch itself lands as fresh files. Swap
    * order is the delete's no-loss order: replacements and inserts move
    * IN first under collision-free names, originals are deleted second —
    * a crash inside the window duplicates (at-least-once), never loses;
    * exact dedup downstream reclaims duplicates, nothing reclaims a lost
    * row. All I/O through Hadoop FS (object-store URIs work; per-file
    * moves only, no directory renames). Mutators serialize on the root
    * via [[graft.sources.ArtifactStore.withRootClaim]] (see
    * [[deleteWhereKeys]]' coordination contract); evolving-artifact
    * lineages that need racing writers go through
    * [[graft.sources.ArtifactStore.commitExclusive]] instead.
    *
    * `updates` must carry exactly the dataset's columns (any order) and
    * at most one row per key — a multi-row key has no deterministic
    * winner, so it fails fast rather than landing order-dependent data.
    *
    * @param onBeforeDeleteOriginals test seam between move-in and delete,
    *        as in [[deleteWhereKeys]] */
  def upsertByKey(spark: SparkSession, path: String, keyCol: String,
      updates: DataFrame, inListLimit: Int = DeleteInListLimit,
      onBeforeDeleteOriginals: () => Unit = () => (),
      claimMaxWaitMs: Long = 10 * 60 * 1000L): UpsertStats = {
    val fs = graft.sources.ArtifactStore.fs(path)
    graft.sources.ArtifactStore.withRootClaim(fs, path,
        maxWaitMs = claimMaxWaitMs) {
    val dataDir = new org.apache.hadoop.fs.Path(path)
    val existing = spark.read.parquet(path)
    require(existing.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert batch columns ${updates.columns.sorted.mkString(",")} != " +
        s"dataset columns ${existing.columns.sorted.mkString(",")}")
    // align column order to the dataset's so the landed files share one
    // schema; cache: read again for keys, counted once via observe below
    val batch = updates.select(existing.columns.map(col).toIndexedSeq: _*)
    val allFiles = fs.listStatus(dataDir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val keys = batch.select(col(keyCol)).distinct()
    val (affected, inListDetail) =
      hitFilesDetailed(spark, path, keyCol, keys, inListLimit)
    val inList = inListDetail.map(_._1)

    val tag = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val tmp = new org.apache.hadoop.fs.Path(s"$path.upsert_$tag")
    val tmpKept = new org.apache.hadoop.fs.Path(tmp, "kept")
    val tmpNew = new org.apache.hadoop.fs.Path(tmp, "new")

    // Batch validation (null keys are unreplaceable — null never
    // equi-matches; duplicate keys have no deterministic winner): must
    // fail before anything becomes VISIBLE (nothing moves into the
    // dataset until the swap below). Round-21 fusion (guide §2.4 /
    // VERDICT r20 #1 — fold guard actions into passes that already
    // materialize): on the IN-list path the literal list IS the batch's
    // complete distinct key set, collected anyway to pick the discovery
    // plan — the null check reads it on the driver, the distinct count
    // k is its size, and the batch row count rides the batch's own
    // staging write via `observe` (written first, so a duplicate-key
    // batch aborts before the kept-file rewrite runs); nBatch == k ⟺
    // no duplicates. The old dedicated count/count_distinct aggregation
    // job — a full extra pass over every update batch at any scale —
    // only remains on the unbounded-key-set path, where the keys were
    // never collected (count_distinct cannot ride observe).
    val nBatch = inListDetail match {
      case Some((_, vals)) =>
        if (vals.contains(null)) {
          fs.delete(tmp, true)
          throw new IllegalArgumentException(
            s"requirement failed: upsert batch has null $keyCol rows")
        }
        val obsN = org.apache.spark.sql.Observation(s"graft_upsert_n_$tag")
        batch.observe(obsN, count(lit(1)).as("n"))
          .write.parquet(tmpNew.toString)
        val n = obsN.get("n") match { case m: Number => m.longValue() }
        if (n != vals.size) {
          fs.delete(tmp, true)
          throw new IllegalArgumentException(
            s"requirement failed: upsert batch has ${n - vals.size} duplicate " +
              s"$keyCol rows — no deterministic winner; dedup the batch first")
        }
        n
      case None =>
        val counted = batch.agg(
          count(lit(1)).as("n"), count_distinct(col(keyCol)).as("k"),
          sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("nulls")).head()
        val n = counted.getLong(0)
        require(counted.getLong(2) == 0L,
          s"upsert batch has ${counted.getLong(2)} null $keyCol rows")
        require(counted.getLong(1) == n,
          s"upsert batch has ${n - counted.getLong(1)} duplicate $keyCol rows — " +
            "no deterministic winner; dedup the batch first")
        batch.write.parquet(tmpNew.toString)
        n
    }
    val replaced =
      if (affected.isEmpty) 0L
      else {
        val affectedDf = spark.read.parquet(affected: _*)
        val marked = inList match {
          case Some(lits) =>
            affectedDf.withColumn("_hit", col(keyCol).isin(lits: _*))
          case None =>
            affectedDf.join(
              keys.withColumnRenamed(keyCol, "_upsert_key")
                .withColumn("_hit", lit(true)),
              col(keyCol) === col("_upsert_key"), "left_outer")
              .drop("_upsert_key")
        }
        val obs = org.apache.spark.sql.Observation(s"graft_upsert_$tag")
        marked
          .observe(obs, sum(when(col("_hit"), 1L).otherwise(0L)).as("replaced"))
          .filter(!coalesce(col("_hit"), lit(false))).drop("_hit")
          .write.parquet(tmpKept.toString)
        obs.get("replaced") match { case null => 0L; case n: Number => n.longValue() }
      }

    // ---- swap: new data IN first, originals out second ---------------
    def moveIn(dir: org.apache.hadoop.fs.Path, prefix: String): Unit =
      if (fs.exists(dir))
        fs.listStatus(dir)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
          .zipWithIndex.foreach { case (st, i) =>
            fs.rename(st.getPath,
              new org.apache.hadoop.fs.Path(dataDir, s"part-$prefix$i-$tag.parquet"))
          }
    moveIn(tmpKept, "uk")
    moveIn(tmpNew, "un")
    onBeforeDeleteOriginals()
    affected.foreach(u => fs.delete(new org.apache.hadoop.fs.Path(u), false))
    fs.delete(tmp, true)
    UpsertStats(allFiles.length, affected.length, replaced, nBatch - replaced)
    }
  }

  /** Outcome of a [[compactSmallFiles]] pass. */
  final case class CompactStats(filesBefore: Int, filesAfter: Int,
      filesCompacted: Int, bytesCompacted: Long)

  /** Small-file compaction over a landed flat parquet dataset: merge
    * every file under `minBytes` into ~`targetBytes` outputs, leaving
    * files already at size byte-identical on disk. Incremental sinks
    * (the streaming absorb loop, per-batch [[upsertByKey]] inserts, the
    * reference's 200-row objects — `S3.py:137-156`) accrete files whose
    * per-file open/footer cost eventually dominates the scan: at 100 TB
    * a million 100 KB objects is a listing+seek storm, and compaction is
    * the standing maintenance op every table format ships. Wired into
    * [[graft.Maintain]] next to index compact + vacuum.
    *
    * Plan shape: ONE read over just the undersized files (driver holds
    * file names + sizes — listing metadata, never rows), `coalesce` to
    * the byte-derived bin count (merges input partitions, NO shuffle —
    * row order within files may change, content cannot), one write.
    * Swap order as everywhere in this file: compacted files move in
    * first, the originals they absorb are deleted second — crash inside
    * the window duplicates, never loses. Mutators serialize on the root
    * via [[graft.sources.ArtifactStore.withRootClaim]] (see
    * [[deleteWhereKeys]]' coordination contract) — exactly the "cron'd
    * Maintain racing a nightly upsert" interleave this prevents.
    *
    * @param onBeforeDeleteOriginals test seam, as in [[deleteWhereKeys]] */
  def compactSmallFiles(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20, minBytes: Long = 32L << 20,
      onBeforeDeleteOriginals: () => Unit = () => (),
      claimMaxWaitMs: Long = 10 * 60 * 1000L): CompactStats = {
    require(minBytes <= targetBytes, s"minBytes $minBytes > targetBytes $targetBytes")
    val fs = graft.sources.ArtifactStore.fs(path)
    graft.sources.ArtifactStore.withRootClaim(fs, path,
        maxWaitMs = claimMaxWaitMs) {
    val dataDir = new org.apache.hadoop.fs.Path(path)
    val all = fs.listStatus(dataDir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val small = all.filter(_.getLen < minBytes).sortBy(_.getPath.getName)
    if (small.length < 2) CompactStats(all.length, all.length, 0, 0L) else {
    val bytes = small.map(_.getLen).sum
    val bins = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tag = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compact_$tag")
    spark.read.parquet(small.map(_.getPath.toString).toIndexedSeq: _*)
      .coalesce(bins)
      .write.parquet(tmp.toString)
    val moved = fs.listStatus(tmp)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    moved.zipWithIndex.foreach { case (st, i) =>
      fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(dataDir, s"part-c$i-$tag.parquet"))
    }
    onBeforeDeleteOriginals()
    small.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
    CompactStats(all.length, all.length - small.length + moved.length,
      small.length, bytes)
    }
    }
  }

  /** K7: local debug dump (`save_json`, `S3.py:345-349`). */
  def jsonDump(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)

  /** K5: delete one object/prefix (`alter_s3_file` delete mode,
    * `Utils/S3.py:270-311`); overwrite mode is `SaveMode.Overwrite` on the
    * writers above. */
  def deletePath(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** K8: persist the unprocessed tail as a leftover dataset
    * (`EC2/processor.py:108-124` writes `backfill/leftovers/...`). */
  def saveLeftovers(keys: DataFrame, path: String): Unit =
    keys.write.mode("overwrite").parquet(path)

  /** K8 re-drive: leftovers minus what a later run processed — left-anti
    * on the key; overwrite-with-tail when non-empty, delete-when-drained
    * is the caller's call (`EC2/leftover.py:93,166,213-221`). */
  def remainingLeftovers(spark: SparkSession, path: String,
      processed: DataFrame, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .join(processed, Seq(keyCol), "left_anti")

  /** K9: the incremental-window state document
    * (`{"start_epoch": s, "end_epoch": e}` — `utils.sh:362-384`). Tiny
    * driver-side JSON, the checkpoint/offset analog. */
  def writeState(path: String, startEpoch: Long, endEpoch: Long): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p,
      s"""{"start_epoch": $startEpoch, "end_epoch": $endEpoch}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Read the state document back; None if absent (first run). */
  def readState(path: String): Option[(Long, Long)] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val num = """"(start_epoch|end_epoch)"\s*:\s*(-?\d+)""".r
      val m = num.findAllMatchIn(s).map(x => x.group(1) -> x.group(2).toLong).toMap
      for (a <- m.get("start_epoch"); b <- m.get("end_epoch")) yield (a, b)
    }
  }
}
