package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.JdbcSink
import graft.operators.Evolve

/** Live JDBC sink over embedded Derby: schema-evolving append (S12/K4),
  * transactional batched load with rollback (K6), and the exactly-once
  * commit-log load (St6). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_derby_$tag").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def readTable(url: String, table: String) =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  test("S12/K4: appendEvolve creates, then ALTERs for an evolving batch") {
    val url = freshUrl("evolve")
    val b1 = Seq((1L, "open"), (2L, "closed")).toDF("k", "status")
    val b2 = Seq((3L, "open", 12.5), (4L, "open", 7.25)).toDF("k", "status", "price")

    val ddl1 = JdbcSink.appendEvolve(b1, url, "loads")
    assert(ddl1.size == 1 && ddl1.head.startsWith("CREATE TABLE loads"))
    val ddl2 = JdbcSink.appendEvolve(b2, url, "loads")
    assert(ddl2 == Seq("ALTER TABLE loads ADD COLUMN \"price\" DECIMAL(10,2)"))

    val back = readTable(url, "loads")
    assert(back.columns.toSeq == Seq("k", "status", "price"))
    assert(back.count() == 4)
    // rows that predate the column are null-padded, later rows carry values
    assert(back.filter($"price".isNull).count() == 2)
    assert(back.filter($"k" === 3).select($"price".cast("double"))
      .head().getDouble(0) == 12.5)
    // idempotent DDL: re-appending the same shape emits no statements
    assert(JdbcSink.appendEvolve(b2, url, "loads").isEmpty)
  }

  test("credential provider: sourced creds drive the sink; missing keys reported together") {
    import graft.sinks.Credentials
    val dir = Files.createTempDirectory("graft_derby_creds").toString
    val src = new Credentials.MapSource(Map(
      "DB_URL-dev" -> s"jdbc:derby:$dir/db;create=true",
      "DB_USER" -> "app", "DB_PASSWORD-dev" -> "s3cret"))
    val creds = Credentials.dbCreds(src, "DB_URL-dev",
      Some("DB_USER"), Some("DB_PASSWORD-dev"))
    // logging shape: password is masked, never printed
    assert(creds.toString.contains("******") && !creds.toString.contains("s3cret"))
    // the sourced creds drive the real sink end to end (embedded Derby
    // accepts arbitrary user/password properties)
    JdbcSink.appendEvolve(Seq((1L, "a")).toDF("k", "v"), creds, "via_creds")
    assert(readTable(creds.url, "via_creds").count() == 1)
    // every missing name reported at once (lambda_function.py:56-62)
    val err = intercept[IllegalArgumentException] {
      Credentials.dbCreds(new Credentials.MapSource(Map.empty), "DB_URL-dev",
        Some("DB_USER"), Some("DB_PASSWORD-dev"))
    }
    assert(err.getMessage.contains("DB_URL-dev") && err.getMessage.contains("DB_USER")
      && err.getMessage.contains("DB_PASSWORD-dev"))
    // once-per-process caching: the store is asked once per present key
    var asks = 0
    val counting = new Credentials.SecretSource {
      def get(k: String): Option[String] = { asks += 1; src.get(k) }
    }
    val cached = new Credentials.CachedSource(counting)
    cached.get("DB_USER"); cached.get("DB_USER"); cached.get("DB_USER")
    assert(asks == 1)
    // absent keys are not negatively cached: found after late creation
    cached.get("LATE"); assert(asks == 2)
  }

  test("K4 faithful twin: the batch that introduces a column loses its values (sql.py:26-39)") {
    val url = freshUrl("faithful")
    val b1 = Seq((1L, "open"), (2L, "closed")).toDF("k", "status")
    val b2 = Seq((3L, "open", 12.5), (4L, "open", 7.25)).toDF("k", "status", "price")

    // first batch on a fresh table: twin and fixed semantics agree
    val ddl1 = JdbcSink.appendEvolveFaithful(b1, url, "loads_f")
    assert(ddl1.size == 1 && ddl1.head.startsWith("CREATE TABLE loads_f"))
    // the evolving batch: ALTER runs (column exists), but the INSERT is
    // aligned to the PRE-ALTER column list — b2's prices are dropped
    val ddl2 = JdbcSink.appendEvolveFaithful(b2, url, "loads_f")
    assert(ddl2 == Seq("ALTER TABLE loads_f ADD COLUMN \"price\" DECIMAL(10,2)"))
    val afterB2 = readTable(url, "loads_f")
    assert(afterB2.columns.toSeq == Seq("k", "status", "price"))
    assert(afterB2.filter($"price".isNotNull).count() == 0,
      "faithful twin repaired the first-batch column drop")
    // the NEXT batch's values land — the quirk is first-batch-only
    JdbcSink.appendEvolveFaithful(
      Seq((5L, "open", 3.75)).toDF("k", "status", "price"), url, "loads_f")
    val afterB3 = readTable(url, "loads_f")
    assert(afterB3.filter($"k" === 5).select($"price".cast("double"))
      .head().getDouble(0) == 3.75)
    assert(afterB3.filter($"price".isNotNull).count() == 1)
    // contrast: the FIXED semantics (appendEvolve) land b2's values
    // immediately — the divergence the twin exists to document
    JdbcSink.appendEvolve(b1, url, "loads_fixed")
    JdbcSink.appendEvolve(b2, url, "loads_fixed")
    assert(readTable(url, "loads_fixed").filter($"price".isNotNull).count() == 2)
  }

  test("K6: transactionalLoad lands all batches; aligned to table order") {
    val url = freshUrl("txn")
    // 5 rows with batchSize=2 → 3 executeBatch calls in one txn
    val df = (1 to 5).map(i => (i.toLong, s"r$i")).toDF("k", "s")
    JdbcSink.transactionalLoad(df, url, "t6", batchSize = 2)
    assert(readTable(url, "t6").count() == 5)
    // evolving second load: new column via driver-side ALTER, old rows null
    val df2 = Seq((6L, "r6", true)).toDF("k", "s", "flag")
    JdbcSink.transactionalLoad(df2, url, "t6", batchSize = 2)
    val back = readTable(url, "t6")
    assert(back.count() == 6)
    assert(back.filter($"flag".isNull).count() == 5)
  }

  test("K6: a failing batch rolls back the WHOLE partition transaction") {
    val url = freshUrl("rollback")
    // seed a committed row behind a PRIMARY KEY constraint
    val conn = JdbcSink.connect(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE txr (\"k\" BIGINT NOT NULL PRIMARY KEY, \"s\" VARCHAR(255))")
      st.execute("INSERT INTO txr VALUES (1, 'seed')")
      st.close()
    } finally conn.close()
    // one partition, batchSize 1: k=7 inserts fine, k=1 then violates the
    // PK — the rollback must ALSO undo k=7 (all-or-nothing per the
    // reference's one-file transaction contract)
    val bad = Seq((7L, "ok"), (1L, "dup")).toDF("k", "s").coalesce(1)
    intercept[Exception] {
      JdbcSink.transactionalLoad(bad, url, "txr", batchSize = 1)
    }
    val back = readTable(url, "txr")
    assert(back.count() == 1)
    assert(back.select("s").head().getString(0) == "seed")
  }

  test("St6: idempotentLoad — re-driving the same batch never duplicates") {
    val url = freshUrl("once")
    val df = (1 to 8).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(2)
    JdbcSink.idempotentLoad(df, url, "ex1", batchId = 42L)
    assert(readTable(url, "ex1").count() == 8)
    // same batch re-delivered (foreachBatch retry semantics): no-op
    JdbcSink.idempotentLoad(df, url, "ex1", batchId = 42L)
    assert(readTable(url, "ex1").count() == 8)
    // a NEW batch id is new data
    JdbcSink.idempotentLoad(df, url, "ex1", batchId = 43L)
    assert(readTable(url, "ex1").count() == 16)
    // the commit log recorded both batches for every partition
    assert(readTable(url, "ex1_log").count() == 4)
  }

  test("St6: a mid-partition crash rolls back data AND marker; the re-drive lands exactly once") {
    val url = freshUrl("crash")
    // seed the table shape so the poison run hits the insert path, and put
    // a 255-char bound on v by seeding through evolve
    JdbcSink.idempotentLoad(Seq((0L, "seed")).toDF("k", "v").coalesce(1),
      url, "ex2", batchId = 1L)
    // poison: a 300-char string violates VARCHAR(255) on the 3rd row of a
    // single partition with batchSize=1 — rows 1-2 are already executeBatch'd
    // when the crash hits, so only a full-txn rollback keeps them out
    val poison = Seq((1L, "a"), (2L, "b"), (3L, "x" * 300), (4L, "d"))
      .toDF("k", "v").coalesce(1)
    intercept[Exception] {
      JdbcSink.idempotentLoad(poison, url, "ex2", batchId = 2L, batchSize = 1)
    }
    assert(readTable(url, "ex2").count() == 1, "partial rows survived the crash")
    assert(readTable(url, "ex2_log").count() == 1, "crashed attempt left its marker")
    // re-drive of the SAME batch id with fixed data: lands all four rows once
    val fixed = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1)
    JdbcSink.idempotentLoad(fixed, url, "ex2", batchId = 2L, batchSize = 1)
    assert(readTable(url, "ex2").count() == 5)
    // and a re-delivery after success is still a no-op
    JdbcSink.idempotentLoad(fixed, url, "ex2", batchId = 2L, batchSize = 1)
    assert(readTable(url, "ex2").count() == 5)
  }

  test("St6: the log PRIMARY KEY blocks a raw double-claim of one (batch_id, partition_id)") {
    val url = freshUrl("pkrace")
    JdbcSink.idempotentLoad(Seq((0L, "seed")).toDF("k", "v").coalesce(1),
      url, "ex3", batchId = 1L) // creates ex3_log with its PK
    val put = "INSERT INTO ex3_log (\"batch_id\", \"partition_id\") VALUES (9, 0)"
    val c1 = JdbcSink.connect(url)
    val loserError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    try {
      c1.setAutoCommit(false)
      val s1 = c1.createStatement(); s1.execute(put); s1.close() // claim, uncommitted
      val loser = new Thread(() => {
        val c2 = JdbcSink.connect(url)
        try {
          c2.setAutoCommit(false)
          val s2 = c2.createStatement()
          // blocks on c1's row lock, then must hit the PK once c1 commits
          try { s2.execute(put); c2.commit() }
          catch { case t: Throwable => loserError.set(t); c2.rollback() }
          finally s2.close()
        } finally c2.close()
      })
      loser.start()
      Thread.sleep(500) // let the loser reach the blocked insert
      c1.commit()
      loser.join(60000)
    } finally c1.close()
    assert(loserError.get() != null, "double claim was NOT blocked")
    assert(loserError.get().isInstanceOf[java.sql.SQLException])
    val sqlState = loserError.get().asInstanceOf[java.sql.SQLException].getSQLState
    assert(sqlState == "23505", s"expected duplicate-key SQLState, got $sqlState")
  }

  test("St6: concurrent idempotentLoads of the same batch land exactly once") {
    val url = freshUrl("conc")
    val df = (1 to 8).map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
    JdbcSink.idempotentLoad(df, url, "ex4", batchId = 1L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (2 to 4).foreach { b =>
        val gate = new java.util.concurrent.CyclicBarrier(2)
        val attempts = (1 to 2).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              gate.await()
              JdbcSink.idempotentLoad(df, url, "ex4", batchId = b.toLong)
            }
          })
        }
        attempts.foreach(_.get()) // both must finish cleanly (loser skips)
      }
    } finally pool.shutdown()
    // batches 1..4 × 8 rows, each exactly once
    assert(readTable(url, "ex4").count() == 32)
    assert(readTable(url, "ex4_log").count() == 4)
  }

  test("St6: a legacy log table without a PRIMARY KEY is retrofitted (or refused)") {
    val url = freshUrl("retrofit")
    // legacy shape: NOT NULL columns but no PK — retrofittable
    val c = JdbcSink.connect(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE ex5_log (\"batch_id\" BIGINT NOT NULL, \"partition_id\" INT NOT NULL)")
      // and an unfixable one: nullable columns can't take a PK in Derby
      st.execute("CREATE TABLE ex6_log (\"batch_id\" BIGINT, \"partition_id\" INT)")
      st.close()
    } finally c.close()
    val df = Seq((1L, "a")).toDF("k", "v").coalesce(1)
    JdbcSink.idempotentLoad(df, url, "ex5", batchId = 7L) // retrofits the PK
    JdbcSink.idempotentLoad(df, url, "ex5", batchId = 7L) // … which still dedups
    assert(readTable(url, "ex5").count() == 1)
    val c2 = JdbcSink.connect(url)
    try {
      val rs = c2.getMetaData.getPrimaryKeys(null, null, "EX5_LOG")
      assert(rs.next(), "PK was not retrofitted onto the legacy log table")
      rs.close()
    } finally c2.close()
    // the unfixable table must FAIL LOUDLY, not run without race protection
    intercept[IllegalStateException] {
      JdbcSink.idempotentLoad(df, url, "ex6", batchId = 7L)
    }
  }

  test("dialects: Derby quoting/type map diverge from reference MySQL only where they must") {
    val schema = Seq((1L, "x", 1.5)).toDF("id", "name", "score").schema
    assert(Evolve.createTableDdl("t", schema) ==
      "CREATE TABLE t (`id` BIGINT, `name` VARCHAR(255), `score` DECIMAL(10,2))")
    assert(Evolve.createTableDdl("t", schema, JdbcSink.Derby.quote, JdbcSink.Derby.typeName) ==
      "CREATE TABLE t (\"id\" BIGINT, \"name\" VARCHAR(255), \"score\" DECIMAL(10,2))")
    assert(JdbcSink.Derby.typeName(org.apache.spark.sql.types.NullType) == "LONG VARCHAR")
  }
}
