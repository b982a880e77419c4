package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Structured Streaming semantics: tumbling windows + watermark late-drop,
  * file-arrival source, streaming dedup (St2/St3/St7/S11). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 +min

  test("tumbling window with watermark: append mode finalizes windows, drops too-late rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val q = Streams.tumblingCounts(mem.toDF().toDF("ts", "id"), "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("append")
      .start()
    mem.addData((ts(1), 1L), (ts(2), 2L), (ts(11), 3L))
    q.processAllAvailable()
    // advance watermark far enough to close the first two windows
    mem.addData((ts(40), 4L))
    q.processAllAvailable()
    // a row behind the watermark is dropped, not re-opened
    mem.addData((ts(3), 99L), (ts(41), 5L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("win_counts").select($"win_start", $"n")
      .as[(Timestamp, Long)].collect().toMap
    assert(out(ts(0)) == 2L)   // minutes 1,2 — late row 99 NOT counted
    assert(out(ts(10)) == 1L)  // minute 11
  }

  test("file-arrival source processes dropped JSON files (S11)") {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_ck").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/b1.json"),
      """{"matchId":"NA1_1","queue":420}
        |{"matchId":"NA1_2","queue":440}""".stripMargin)
    val q = Streams.jsonFileSource(spark, dir, "matchId STRING, queue INT")
      .writeStream.format("memory").queryName("arrivals")
      .option("checkpointLocation", out)
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("arrivals").count() == 2)
  }

  test("stream-static anti join gates arriving docs against the corpus (incremental dedup)") {
    val dir = Files.createTempDirectory("graft_doc_stream").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch.json"),
      """{"doc_id":900,"text":"already landed body"}
        |{"doc_id":901,"text":"genuinely new body"}
        |{"doc_id":902,"text":"another new body"}""".stripMargin)
    val corpus = Seq("already landed body", "some other corpus doc").toDF("text")
      .select(org.apache.spark.sql.functions.sha2($"text", 256).as("h"))
    val stream = Streams.jsonFileSource(spark, dir, "doc_id BIGINT, text STRING")
    val q = Streams.dedupAgainstCorpus(stream, corpus, "text")
      .writeStream.format("memory").queryName("inc_dedup")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("inc_dedup").select("doc_id").as[Long].collect().toSet
      == Set(901L, 902L))
  }

  test("streaming tumbling windows == batch window_tumbling on the same events") {
    // same 2-day windows, driven as a stream from a parquet drop dir
    val dir = Files.createTempDirectory("graft_ev_stream").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema.toDDL).parquet(dir)
    val q = Streams.tumblingCounts(stream, "ts", "2 days", "0 seconds")
      .writeStream.format("memory").queryName("stream_windows")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_windows")
      .select($"win_start", $"n").as[(java.sql.Timestamp, Long)].collect().toMap
    val batch = events.groupBy(org.apache.spark.sql.functions.window($"ts", "2 days"))
      .count().select($"window.start", $"count")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("foreachBatch lands each micro-batch through the partitioned sink (K2 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_fb_out").toString + "/data"
    val mem = MemoryStream[(Timestamp, Long)]
    val q = mem.toDF().toDF("ts", "id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sinks.Writers.partitionedByDate(batch, "ts", out)
      }.start()
    mem.addData((Timestamp.valueOf("2025-07-28 12:00:00"), 1L))
    q.processAllAvailable()
    mem.addData((Timestamp.valueOf("2024-01-02 00:00:00"), 2L))
    q.processAllAvailable()
    q.stop()
    // dynamic overwrite: batch 2 did not wipe batch 1's partition
    assert(spark.read.parquet(out).count() == 2)
  }

  test("e2e: file arrivals → match ETL → partitioned sink; checkpoint resume reprocesses nothing") {
    val in = Files.createTempDirectory("graft_e2e_in").toString
    val ck = Files.createTempDirectory("graft_e2e_ck").toString
    val out = Files.createTempDirectory("graft_e2e_out").toString + "/player_data"
    val fixture = Files.readString(
      java.nio.file.Paths.get(new java.net.URI(TestSpark.fixture("match.json"))))
    Files.writeString(java.nio.file.Paths.get(s"$in/f1.json"), fixture)
    val schema = spark.read.option("multiLine", true).json(s"$in/f1.json").schema

    def drain(): Unit = {
      val q = Streams.matchPipeline(spark, in, schema, out, ck)
      q.awaitTermination()
    }
    def landedFiles() = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    }

    drain()
    assert(spark.read.parquet(out).count() == 3)
    val afterFirst = landedFiles()

    // resume with NO new arrivals: the checkpoint replays nothing — not
    // even a rewrite of existing partitions (file set + mtimes unchanged)
    drain()
    assert(landedFiles() == afterFirst)

    // a NEW file (same shape, 2024 dates) arrives; resume processes ONLY it
    Files.writeString(java.nio.file.Paths.get(s"$in/f2.json"),
      fixture.replace("NA1_5200190036", "NA1_9900000001")
        .replace("NA1_5200190037", "NA1_9900000002")
        .replace("1753704000000", "1704067200000")
        .replace("1753790400000", "1704153600000"))
    drain()
    val back = spark.read.parquet(out)
    assert(back.count() == 6)
    assert(back.select("matchId").distinct().count() == 4)
    // the 2025 partitions from f1 were not rewritten by f2's batch
    assert(landedFiles().filter(_._1.contains("year=2025")) ==
      afterFirst.filter(_._1.contains("year=2025")))
  }

  test("matchPipeline stream drain == batch matchEtl through the same sink, every column") {
    val in = Files.createTempDirectory("graft_eq_in").toString
    val ck = Files.createTempDirectory("graft_eq_ck").toString
    val base = Files.createTempDirectory("graft_eq_out").toString
    val fixture = Files.readString(
      java.nio.file.Paths.get(new java.net.URI(TestSpark.fixture("match.json"))))
    Files.writeString(java.nio.file.Paths.get(s"$in/f1.json"), fixture)
    val schema = spark.read.option("multiLine", true).json(s"$in/f1.json").schema

    // streamed: AvailableNow drain through the event-time partitioned sink
    Streams.matchPipeline(spark, in, schema, s"$base/streamed", ck).awaitTermination()
    // batch: the same files through the same ETL + the same sink
    val batch = graft.driver.Pipeline
      .matchEtl(spark.read.option("multiLine", true).schema(schema).json(in))
      .withColumn("event_ts",
        org.apache.spark.sql.functions.timestamp_millis($"gameCreation"))
    graft.sinks.Writers.partitionedByEventTime(batch, "event_ts", s"$base/batch")

    val s1 = spark.read.parquet(s"$base/streamed")
    val s2 = spark.read.parquet(s"$base/batch")
    assert(s1.columns.sorted.toSeq == s2.columns.sorted.toSeq)
    val cols = s1.columns.sorted.toSeq.map(org.apache.spark.sql.functions.col)
    assert(s1.select(cols: _*).exceptAll(s2.select(cols: _*)).isEmpty &&
      s2.select(cols: _*).exceptAll(s1.select(cols: _*)).isEmpty,
      "streamed and batch sink contents diverge")
  }

  test("St6 streaming e2e: foreachBatch → idempotentLoad lands exactly once across restarts") {
    val in = Files.createTempDirectory("graft_jdbc_in").toString
    val ck = Files.createTempDirectory("graft_jdbc_ck").toString
    val db = Files.createTempDirectory("graft_jdbc_db").toString
    val url = s"jdbc:derby:$db/db;create=true"
    Files.writeString(java.nio.file.Paths.get(s"$in/f1.json"),
      """{"k":1,"v":"a"}
        |{"k":2,"v":"b"}""".stripMargin)
    def drain(): Unit = {
      val q = graft.streaming.Streams.jsonFileSource(spark, in, "k BIGINT, v STRING")
        .writeStream
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.sinks.JdbcSink.idempotentLoad(b, url, "stream_tbl", id)
        }
        .start()
      q.awaitTermination()
    }
    def count(): Long = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "stream_tbl").load().count()
    drain()
    assert(count() == 2)
    // restart with no new arrivals: the checkpoint replays nothing AND a
    // hypothetical re-delivery would hit the commit log — still 2 rows
    drain()
    assert(count() == 2)
    // the same micro-batch REDELIVERED out-of-band (the crash-after-write
    // case foreachBatch is documented to produce): commit log dedups it
    val replay = spark.read.schema("k BIGINT, v STRING").json(s"$in/f1.json")
    graft.sinks.JdbcSink.idempotentLoad(replay.coalesce(1), url, "stream_tbl", 0L)
    assert(count() == 2)
    // a new arrival is new data
    Files.writeString(java.nio.file.Paths.get(s"$in/f2.json"), """{"k":3,"v":"c"}""")
    drain()
    assert(count() == 3)
  }

  test("flatMapGroupsWithState sessionize: in-batch gaps and timeouts both close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val src = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
      .select($"user_id", $"ts", org.apache.spark.sql.functions.unix_micros($"ts").as("us"))
    val gapUs = 30L * 60 * 1000 * 1000 // 30 minutes
    val q = Streams.sessionizeStream(src, gapUs)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    // batch 1: user 1 active at minutes 0 and 5; user 2 at minute 1
    mem.addData((ts(0), 1L), (ts(5), 1L), (ts(1), 2L))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // nothing closed yet
    // batch 2: user 1 reappears past the gap → closes [0,5] IN-BATCH;
    // watermark advances to minute 90
    mem.addData((ts(90), 1L))
    q.processAllAvailable()
    // batch 3: any data lets the timeout sweep run → user 2's session
    // (horizon minute 31 < watermark 90) closes by TIMEOUT
    mem.addData((ts(91), 3L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val base = 1704067200000000L // 2024-01-01 in micros
    def us(min: Int) = base + min * 60000000L
    assert(out == Set(
      (1L, us(0), us(5), 2L),  // closed by the in-batch gap
      (2L, us(1), us(1), 1L))) // closed by the event-time timeout
  }

  test("sessionize stream == batch session_window on the full fixture (differential)") {
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val gapUs = 3600L * 1000 * 1000 // the batch row's 1-hour gap
    val events = graft.sources.Tables.events(spark, d)
      .filter($"user_id".isNotNull)
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val mem = MemoryStream[(Long, Long)]
    val src = mem.toDF().toDF("user_id", "us")
      .select($"user_id", org.apache.spark.sql.functions.timestamp_micros($"us").as("ts"), $"us")
      .withWatermark("ts", "0 seconds")
    val q = Streams.sessionizeStream(src, gapUs)
      .writeStream.format("memory").queryName("sessions_full").outputMode("append")
      .start()
    // feed in three event-time-ordered chunks, then two far-future flush
    // events (user -1): the first advances the watermark past every real
    // horizon, the second triggers the timeout sweep for all real users
    val maxUs = events.last._2
    events.grouped((events.length / 3).max(1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    mem.addData((-1L, maxUs + 10L * 3600 * 1000000L)); q.processAllAvailable()
    mem.addData((-1L, maxUs + 11L * 3600 * 1000000L)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_full")
      .filter($"user_id" =!= -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: the oracle-gated session_window row's semantics
    // (Spark session_window end = last event + gap)
    val batch = graft.sources.Tables.events(spark, d)
      .filter($"user_id".isNotNull)
      .groupBy($"user_id",
        org.apache.spark.sql.functions.session_window($"ts", "1 hour").as("w"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"w.start").as("start_us"),
        (org.apache.spark.sql.functions.unix_micros($"w.end") - gapUs).as("end_us"),
        $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream/batch session mismatch: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("token-budget stream == batch token_budget; state persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
      .select($"doc_id", $"source",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim($"text"), " ")).cast("long").as("n_tokens"))
    val ordered = docs.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .sortBy(_._2)
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.tokenBudgetStream(
        mem.toDF().toDF("source", "doc_id", "n_tokens"), budget = 800L)
      .writeStream.format("memory").queryName("budgeted").outputMode("append")
      .start()
    // five batches: admission state for every source must carry across
    ordered.grouped((ordered.length / 5).max(1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("budgeted")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.queries.LlmOps.capPerSourceTokens(docs, 800L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream/batch budget mismatch: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
    // in-order delivery: the ordering-contract flag is false everywhere
    assert(spark.table("budgeted").filter($"out_of_order").count() == 0)
  }

  test("token-budget stream flags cross-batch out-of-order delivery (ADVICE r07)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.tokenBudgetStream(
        mem.toDF().toDF("source", "doc_id", "n_tokens"), budget = 1000L)
      .writeStream.format("memory").queryName("budget_ooo").outputMode("append")
      .start()
    mem.addData(("s", 10L, 5L), ("s", 20L, 5L)); q.processAllAvailable()
    // a later batch delivers id 15 < max-admitted 20: admitted (budget
    // remains) but FLAGGED — the silent-divergence case the flag exists for
    mem.addData(("s", 15L, 5L), ("s", 30L, 5L)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("budget_ooo")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(rows == Map(10L -> false, 20L -> false, 15L -> true, 30L -> false),
      s"unexpected flags: $rows")
  }

  test("index-absorb streaming dedup: duplicates dropped across batches AND across runs") {
    import graft.sources.DedupIndex
    val root = java.nio.file.Files.createTempDirectory("graft_idx_stream").toString
    val drop = s"$root/drop"; new java.io.File(drop).mkdirs()
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the fence and the birds sing in the morning light"
    val corpus = Seq((1L, base), (2L, "some totally separate corpus content here"))
      .toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, s"$root/idx", buckets = 4)
    val landed = scala.collection.mutable.ListBuffer[Long]()
    def drive(): Unit = {
      val q = graft.streaming.Streams.indexDedupStream(
        graft.streaming.Streams.jsonFileSource(spark, drop,
          "doc_id BIGINT, text STRING"),
        idx, "doc_id", "text") { kept =>
        landed ++= kept.select("doc_id").collect().map(_.getLong(0)); ()
      }
      q.awaitTermination()
    }
    def file(n: String, rows: (Long, String)*): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/$n"),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }.mkString("\n"))
    // run 1: d10 fresh, d11 = exact copy of corpus doc 1 → only d10 lands
    val fresh = "a wholly fresh document first of its name telling a long " +
      "story about streams indexes and the ships that pass between them " +
      "in the night without ever meeting"
    file("f1.json", (10L, fresh), (11L, base))
    drive()
    assert(landed.toSet == Set(10L))
    // run 1's absorb must have landed BOTH sides of the index — the hash
    // AND the band rows (the cache-invalidation bug wrote hashes only)
    assert(spark.table(idx.hashes).count() == 3)
    assert(spark.table(idx.bands).count() == 12)
    // run 2, NEW query over the same index: d12 = exact copy of d10 (a
    // doc admitted in the PREVIOUS run — frozen-static or watermarked
    // dedup both miss this), d13 = near-dup of d10, d14 fresh
    file("f2.json",
      (12L, fresh),
      (13L, fresh + " indeed"),
      (14L, "and now for something completely different again"))
    drive()
    assert(landed.toSet == Set(10L, 14L),
      s"cross-run duplicates must be gated by the absorbed index: $landed")
  }

  test("index-absorb dedup with Bloom sidecar: lockstep maintenance, zero false negatives") {
    import graft.sources.{ArtifactStore, DedupIndex, HashBloom}
    import org.apache.spark.sql.functions.{col => fcol}
    val root = java.nio.file.Files.createTempDirectory("graft_idx_bloom_stream").toString
    val drop = s"$root/drop"; new java.io.File(drop).mkdirs()
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the fence and the birds sing in the morning light"
    val corpus = Seq((1L, base), (2L, "some totally separate corpus content here"))
      .toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, s"$root/idx", buckets = 4)
    val landed = scala.collection.mutable.ListBuffer[Long]()
    def drive(): Unit = {
      val q = graft.streaming.Streams.indexDedupStream(
        graft.streaming.Streams.jsonFileSource(spark, drop,
          "doc_id BIGINT, text STRING"),
        idx, "doc_id", "text", bloomBuckets = 8) { kept =>
        landed ++= kept.select("doc_id").collect().map(_.getLong(0)); ()
      }
      q.awaitTermination()
    }
    def file(n: String, rows: (Long, String)*): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/$n"),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }.mkString("\n"))
    val fresh = "a wholly fresh document first of its name telling a long " +
      "story about streams indexes and the ships that pass between them"
    val fresher = "another new arrival with its own phrasing and no shared " +
      "shingles against anything previously landed in this corpus"
    // batch 1: d10 fresh, d11 = exact corpus dup → only d10 lands
    file("f1.json", (10L, fresh), (11L, base))
    drive()
    assert(landed.toSet == Set(10L))
    // batch 2 (same run lineage, new query): d12 = exact copy of d10 —
    // absorbed LAST batch, so only a lockstep sidecar knows it; a stale
    // sidecar would call it provably-new and bypass the exact gate
    file("f2.json", (12L, fresh), (13L, fresher))
    drive()
    assert(landed.toSet == Set(10L, 13L),
      s"cross-batch duplicate escaped the bloom-gated index: $landed")
    // the published sidecar stays a superset of the hash table: every
    // landed hash probes maybe=true (zero false negatives, end to end)
    val sidecar = DedupIndex.ensureBloom(spark, idx, 8)
    val falseNeg = HashBloom.withMaybe(spark.table(idx.hashes), sidecar, "h",
      HashBloom.bucketsOf(sidecar)).filter(!fcol("_maybe")).count()
    assert(falseNeg == 0L, s"$falseNeg hash-table members probe provably-absent")
    // and the sidecar really evolved: bootstrap version + one absorb per
    // non-empty batch, all committed versions
    assert(ArtifactStore.versions(
      ArtifactStore.fs(s"$root/idx"), s"$root/idx/_bloom").length == 3)
  }

  test("index-absorb dedup: a crashed trigger re-drives its batch; committed batches don't replay") {
    import graft.sources.DedupIndex
    val root = java.nio.file.Files.createTempDirectory("graft_idx_crash").toString
    val drop = s"$root/drop"; new java.io.File(drop).mkdirs()
    val ck = s"$root/ck"
    val corpus = Seq((1L, "entirely unrelated corpus content sits here quietly"))
      .toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, s"$root/idx", buckets = 4)
    val landed = scala.collection.mutable.ListBuffer[Long]()
    @volatile var failNext = false
    def drive(expectFailure: Boolean): Unit = {
      val q = graft.streaming.Streams.indexDedupStream(
        graft.streaming.Streams.jsonFileSource(spark, drop,
          "doc_id BIGINT, text STRING"),
        idx, "doc_id", "text", checkpointDir = Some(ck)) { kept =>
        val ids = kept.select("doc_id").collect().map(_.getLong(0))
        if (failNext && ids.nonEmpty) { failNext = false; sys.error("land crash") }
        landed ++= ids; ()
      }
      if (expectFailure)
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.awaitTermination()
        }
      else q.awaitTermination()
    }
    def file(n: String, rows: (Long, String)*): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/$n"),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }.mkString("\n"))
    // f1 commits normally
    file("f1.json", (10L, "first arrival of a perfectly ordinary document"))
    drive(expectFailure = false)
    assert(landed.toList == List(10L))
    // f2's land crashes BEFORE the absorb: the trigger never commits, the
    // index is untouched, and the restarted query re-drives ONLY f2
    // (f1 is checkpoint-committed and must not replay)
    file("f2.json", (20L, "second arrival of a rather different document entirely"))
    failNext = true
    drive(expectFailure = true)
    assert(landed.toList == List(10L), "crashed trigger must not have landed")
    drive(expectFailure = false)
    assert(landed.toList == List(10L, 20L),
      s"restart must re-drive exactly the failed batch: $landed")
  }

  test("streamTable reads directory-layout fixtures (ScaleUp) == file-layout (driver)") {
    // the driver writes each table as a single FILE `name.parquet`;
    // ScaleUp writes a DIRECTORY of part files under the same name. The
    // old filename-glob stream read matched no part file on the
    // directory layout and silently streamed ZERO rows (the sf1.0 bench
    // "ran" the stream rows 10x faster on 10x data) — pin both layouts
    // through the same catalog read and require equal drained output.
    val src = "/root/testdata/sf0.001"
    val dst = Files.createTempDirectory("graft_dirfix").toString
    ScaleUp.derive(spark, src, dst, copies = 1, tables = Seq("events"))
    assert(new java.io.File(s"$dst/events.parquet").isDirectory)
    def drained(d: String): Map[(java.sql.Timestamp, String), Long] = {
      val q = graft.sources.Tables.normalizeEventTs(
          graft.sources.Tables.streamTable(spark, d, "events"))
        .groupBy(org.apache.spark.sql.functions.window($"ts", "2 days").as("w"), $"event_type")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .writeStream.format("memory").queryName(s"dirfix_${d.hashCode.abs}")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      spark.table(s"dirfix_${d.hashCode.abs}")
        .select($"w.start", $"event_type", $"n")
        .as[(java.sql.Timestamp, String, Long)].collect()
        .map { case (t, e, n) => (t, e) -> n }.toMap
    }
    val fromDir = drained(dst)
    assert(fromDir.nonEmpty && fromDir.values.sum ==
      graft.sources.Tables.events(spark, src).count(),
      "directory layout must stream every row")
    assert(fromDir == drained(src), "both layouts must drain identically")
  }

  test("dropDuplicatesWithinWatermark dedups redelivered ids (St7)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val q = Streams.dedupWithinWatermark(mem.toDF().toDF("ts", "id"), "ts", "id", "10 minutes")
      .writeStream.format("memory").queryName("deduped").outputMode("append")
      .start()
    mem.addData((ts(1), 1L), (ts(1), 1L), (ts(2), 1L), (ts(3), 2L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("deduped").count() == 2) // ids 1 and 2 once each
  }
}
