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

  test("dialects: Derby quoting/type map diverge from reference MySQL only where they must") {
    val schema = Seq((1L, "x", 1.5)).toDF("id", "name", "score").schema
    assert(Evolve.createTableDdl("t", schema) ==
      "CREATE TABLE t (`id` BIGINT, `name` VARCHAR(255), `score` DECIMAL(10,2))")
    assert(Evolve.createTableDdl("t", schema, JdbcSink.Derby.quote, JdbcSink.Derby.typeName) ==
      "CREATE TABLE t (\"id\" BIGINT, \"name\" VARCHAR(255), \"score\" DECIMAL(10,2))")
    assert(JdbcSink.Derby.typeName(org.apache.spark.sql.types.NullType) == "LONG VARCHAR")
  }
}
