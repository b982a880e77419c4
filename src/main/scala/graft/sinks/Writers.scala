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

  /** Targeted delete (right-to-be-forgotten / opt-out removal) over a
    * landed flat parquet dataset: rewrite ONLY the files that contain a
    * dropped key; every other file stays byte-identical on disk. This is
    * the K5 overwrite/delete semantics at corpus scale — deleting a few
    * thousand documents from 100 TB must not rewrite 100 TB.
    *
    * How the touched set stays small: discovery filters the dataset with
    * `keyCol IN (dropKeys)`, which pushes into the parquet scan — on a
    * [[clusteredByRange]]/[[clusteredByZOrder]] layout the per-file
    * min/max footers exclude almost every file without reading data
    * pages, and the survivors are pinned by `input_file_name()`. The
    * rewrite then reads just those files, filters the dropped keys out,
    * and swaps replacement files in (originals removed, replacements
    * moved in under fresh names). Untouched files keep their paths,
    * bytes and mtimes — WritersSpec asserts all three.
    *
    * Contract: `dropKeys` is a bounded explicit list (deletion requests
    * arrive in thousands, not billions — a corpus-proportional drop is a
    * dedup rewrite, [[graft.queries.LlmOps]] `corpus_dedup`, not a
    * delete). Non-transactional like [[graft.sources.DedupIndex.compact]]:
    * single-writer discipline is the caller's; a concurrent reader may
    * see a partially-swapped directory (the same caveat every
    * non-transactional table format carries). */
  def deleteWhere(spark: SparkSession, path: String, keyCol: String,
      dropKeys: Seq[Long]): DeleteStats = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val data = spark.read.parquet(path)
    val allFiles = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val hit = dropKeys.map(lit(_))
    val affected = data
      .filter(col(keyCol).isin(hit: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).sorted
    if (affected.isEmpty) return DeleteStats(allFiles.length, 0, 0L)
    val affectedLocal = affected.map(u => Paths.get(java.net.URI.create(u).getPath))
    val affectedDf = spark.read.parquet(affected.toIndexedSeq: _*)
    val kept = affectedDf.filter(!col(keyCol).isin(hit: _*))
    // one pass over the hit files, not a count-both-sides pair of scans
    val deleted = affectedDf.filter(col(keyCol).isin(hit: _*)).count()
    val tag = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val tmp = s"$path.delete_$tag"
    kept.write.parquet(tmp)
    affectedLocal.foreach { p =>
      Files.deleteIfExists(p)
      // Hadoop's local FS writes a hidden .<name>.crc sidecar per part
      // file — reclaim it with its parquet, or every delete strands one
      Files.deleteIfExists(p.resolveSibling(s".${p.getFileName}.crc"))
    }
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        Files.move(f.toPath,
          Paths.get(s"$path/part-rw$i-$tag.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(new java.io.File(tmp))
    DeleteStats(allFiles.length, affected.length, deleted)
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
