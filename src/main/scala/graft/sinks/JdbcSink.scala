package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Types}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.TaskContext
import graft.operators.Evolve

/** Live JDBC sink over embedded Derby (SURVEY §2.1 S12, §2.2 K6, §2.10 St6
  * — `Utils/sql.py:5-69`, `Lambda/lambda_function.py:309-395`).
  *
  * The reference's load unit is one file: open a connection, start a
  * transaction, evolve the table for novel columns, insert in batches of
  * 200, commit at the end, roll EVERYTHING back on any batch failure. The
  * Spark mapping:
  *
  *  - **schema evolution runs ONCE, on the driver** ([[ensureEvolved]]):
  *    CREATE or `ALTER TABLE ADD COLUMN` from the [[Evolve]] diff — DDL
  *    inside distributed tasks would race;
  *  - **a partition is the transaction unit** ([[transactionalLoad]]):
  *    one connection per partition, batched inserts, commit per partition,
  *    rollback-and-rethrow on any failure — the one-file-one-txn contract
  *    at Spark's parallelism grain (a retried task re-runs an all-or-
  *    nothing unit, so the sink is at-least-once with no partial batches);
  *  - **St6 exactly-once** ([[idempotentLoad]]): a `<table>_log` marker row
  *    `(batch_id, partition_id)` is written in the SAME transaction as the
  *    data, so a retried task (or a re-delivered micro-batch in
  *    `foreachBatch`) sees its marker and skips — the commit-log pattern
  *    file sinks get from `_SUCCESS`, done relationally.
  *
  * Scale: per-partition connections mean sink parallelism = partition
  * count; nothing is collected to the driver. Embedded Derby is the
  * in-process stand-in for the reference's RDS endpoint — the code paths
  * (metadata diff, ALTER, batched upsert, txn scope) are identical against
  * any JDBC URL.
  */
object JdbcSink {

  /** Identifier quoting + DDL type name pair for a target engine. */
  final case class Dialect(quote: String => String, typeName: DataType => String)

  /** Reference-faithful MySQL emission (`sql.py:46-62`). */
  val MySql: Dialect = Dialect(n => s"`$n`", Evolve.toDdlType)

  /** Embedded Derby: ANSI double-quoted identifiers (so lowercase Spark
    * column names survive Derby's uppercase folding); Derby has no TEXT —
    * the NullType fallback becomes LONG VARCHAR. */
  val Derby: Dialect = Dialect(
    n => "\"" + n + "\"",
    dt => Evolve.toDdlType(dt) match {
      case "TEXT" => "LONG VARCHAR"
      case t      => t
    })

  def connect(url: String): Connection = {
    // keep Derby's log out of the working directory
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/derby.log")
    DriverManager.getConnection(url)
  }

  /** [[connect]] from provider-sourced credentials ([[Credentials]]):
    * the production entry point — deployments resolve url/user/password
    * through a [[Credentials.SecretSource]] instead of baking them into
    * config (`Lambda/lambda_function.py:44-62`). */
  def connect(creds: Credentials.DbCreds): Connection = {
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/derby.log")
    DriverManager.getConnection(creds.url, creds.properties)
  }

  /** Current table schema via JDBC metadata (the `DESCRIBE` analog,
    * `sql.py:5-7`), in ordinal order; None when the table doesn't exist.
    * Table names are used UNQUOTED (Derby folds them to uppercase);
    * column names are created quoted, so they round-trip verbatim.
    *
    * `getColumns` treats the table name as a LIKE pattern where `_` is a
    * single-char wildcard — unescaped, `orders_jdbc` would also match an
    * unrelated `ORDERSXJDBC` and merge its columns into the diff. We escape
    * with the driver's search-string escape AND filter on exact TABLE_NAME
    * equality (belt and braces for drivers that ignore the escape). */
  def tableSchema(conn: Connection, table: String): Option[StructType] = {
    val target = table.toUpperCase
    val esc = conn.getMetaData.getSearchStringEscape
    // a driver reporting a null/empty escape would corrupt the pattern
    // (replace("", x) inserts x between every character) — skip escaping
    // and rely on the exact TABLE_NAME filter below
    val pattern =
      if (esc == null || esc.isEmpty) target
      else target
        .replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    val rs = conn.getMetaData.getColumns(null, null, pattern, null)
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    while (rs.next())
      if (rs.getString("TABLE_NAME") == target)
        fields += StructField(rs.getString("COLUMN_NAME"),
          sqlToSpark(rs.getInt("DATA_TYPE"), rs.getInt("COLUMN_SIZE"),
            rs.getInt("DECIMAL_DIGITS")), nullable = true)
    rs.close()
    if (fields.isEmpty) None else Some(StructType(fields.toSeq))
  }

  private def sqlToSpark(sqlType: Int, precision: Int, scale: Int): DataType =
    sqlType match {
      case Types.TINYINT | Types.SMALLINT | Types.INTEGER => IntegerType
      case Types.BIGINT                                   => LongType
      case Types.DECIMAL | Types.NUMERIC                  => DecimalType(precision, scale)
      case Types.FLOAT | Types.REAL | Types.DOUBLE        => DoubleType
      case Types.BOOLEAN | Types.BIT                      => BooleanType
      case _                                              => StringType
    }

  /** CREATE-or-ALTER the table so every `incoming` column exists
    * (`add_new_columns`, `sql.py:10-21`). Returns the executed DDL. */
  def ensureEvolved(conn: Connection, table: String, incoming: StructType,
      dialect: Dialect = Derby): Seq[String] = {
    val ddl = tableSchema(conn, table) match {
      case None =>
        Seq(Evolve.createTableDdl(table, incoming, dialect.quote, dialect.typeName))
      case Some(existing) =>
        Evolve.alterStatements(table, existing, incoming, dialect.quote, dialect.typeName)
    }
    val st = conn.createStatement()
    try ddl.foreach(st.execute) finally st.close()
    ddl
  }

  /** S12 + K4-over-JDBC: evolve the table on one driver connection, then a
    * plain Spark JDBC append (Spark resolves the insert column list against
    * the live table, so old columns the batch lacks default to NULL). */
  def appendEvolve(df: DataFrame, url: String, table: String,
      dialect: Dialect = Derby): Seq[String] = {
    val conn = connect(url)
    val ddl = try ensureEvolved(conn, table, df.schema, dialect) finally conn.close()
    df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table).save()
    ddl
  }

  /** [[appendEvolve]] with provider-sourced credentials — the deployment
    * shape: resolve the connection through a [[Credentials.SecretSource]]
    * (secrets service / env / mounted file), never raw strings in
    * config. Derby dialect (the embedded engine this sink ships with). */
  def appendEvolve(df: DataFrame, creds: Credentials.DbCreds,
      table: String): Seq[String] = {
    val conn = connect(creds)
    val ddl = try ensureEvolved(conn, table, df.schema, Derby) finally conn.close()
    val w = df.write.mode("append").format("jdbc")
      .option("url", creds.url).option("dbtable", table)
    creds.user.foreach(w.option("user", _))
    creds.password.foreach(w.option("password", _))
    w.save()
    ddl
  }

  /** FAITHFUL twin of [[appendEvolve]] (`insert_data_to_mysql`,
    * `Utils/sql.py:26-43`): the reference reads `existing_columns` ONCE,
    * BEFORE the ALTERs, then aligns rows and builds its INSERT against
    * that stale list — so the very batch that INTRODUCES a column is
    * inserted WITHOUT it (the column exists after the ALTER but holds
    * NULL for this batch's rows); values only arrive from the next batch
    * on. Kept next to the fixed semantics the way E3's last-frame bug
    * got its `explode_pframes_last` twin: a user replaying reference
    * history needs the quirk reproducible, not silently repaired. On a
    * brand-new table the two agree (CREATE uses the full incoming
    * schema; the reference's tables pre-exist,
    * `CollectionTests/collection_test.py:71`). */
  def appendEvolveFaithful(df: DataFrame, url: String, table: String,
      dialect: Dialect = Derby): Seq[String] = {
    val conn = connect(url)
    val (ddl, stale) = try {
      val pre = tableSchema(conn, table) // the one DESCRIBE, sql.py:26
      (ensureEvolved(conn, table, df.schema, dialect), pre)
    } finally conn.close()
    val target = stale.getOrElse(df.schema)
    // align_row_data (sql.py:22-23) against the STALE list: this batch's
    // novel columns are dropped; stale columns the batch lacks → NULL
    import org.apache.spark.sql.functions.{col, lit}
    val aligned = df.select(target.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    aligned.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table).save()
    ddl
  }

  private def insertSql(table: String, target: StructType, dialect: Dialect): String =
    s"INSERT INTO $table (${target.fieldNames.map(dialect.quote).mkString(", ")}) " +
      s"VALUES (${Seq.fill(target.size)("?").mkString(", ")})"

  private def bind(ps: PreparedStatement, i: Int, dt: DataType, row: Row): Unit =
    if (row.isNullAt(i - 1)) ps.setNull(i, sparkToSql(dt))
    else dt match {
      case IntegerType      => ps.setInt(i, row.getInt(i - 1))
      case LongType         => ps.setLong(i, row.getLong(i - 1))
      case DoubleType       => ps.setDouble(i, row.getDouble(i - 1))
      case _: DecimalType   => ps.setBigDecimal(i, row.getDecimal(i - 1))
      case BooleanType      => ps.setBoolean(i, row.getBoolean(i - 1))
      case _                => ps.setString(i, String.valueOf(row.get(i - 1)))
    }

  private def sparkToSql(dt: DataType): Int = dt match {
    case IntegerType    => Types.INTEGER
    case LongType       => Types.BIGINT
    case DoubleType     => Types.DOUBLE
    case _: DecimalType => Types.DECIMAL
    case BooleanType    => Types.BOOLEAN
    case _              => Types.VARCHAR
  }

  /** K6: transactional batched load — evolve once on the driver, then one
    * connection + ONE transaction per partition, inserts in `batchSize`
    * batches (`lambda_function.py:309-312` uses 200), commit at partition
    * end, rollback-and-rethrow on any batch failure. */
  def transactionalLoad(df: DataFrame, url: String, table: String,
      batchSize: Int = 200, dialect: Dialect = Derby): Unit = {
    val target = evolveAndTarget(df, url, table, dialect)
    val aligned = Evolve.align(df, target)
    val sql = insertSql(table, target, dialect)
    aligned.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) inTxn(url) { conn =>
        insertBatches(conn, sql, target, it, batchSize)
      }
    }
  }

  /** St6: exactly-once-ish load — same as [[transactionalLoad]], but each
    * partition claims a `(batch_id, partition_id)` marker in `<table>_log`
    * IN THE SAME transaction as the data. A retried task or a re-delivered
    * micro-batch finds the marker and skips, so re-running the same
    * `batchId` never duplicates rows.
    *
    * The marker is the concurrency control, not just a breadcrumb: the log
    * table carries `PRIMARY KEY (batch_id, partition_id)` and the marker is
    * inserted FIRST. Two racing attempts for the same partition (stage
    * retry overlapping a zombie task, or speculative execution) both pass a
    * read-committed COUNT check — but the second marker INSERT blocks on
    * the first's row lock and, once the winner commits, fails the PK
    * constraint; the loser rolls back its whole transaction and skips
    * quietly. Check-then-insert alone would let both commit.
    *
    * Wire as `writeStream.foreachBatch((b, id) => idempotentLoad(b, url,
    * table, id))` for the streaming (St6) path. */
  def idempotentLoad(df: DataFrame, url: String, table: String, batchId: Long,
      batchSize: Int = 200, dialect: Dialect = Derby): Unit = {
    val target = evolveAndTarget(df, url, table, dialect)
    val logTable = s"${table}_log"
    val c = connect(url)
    try ensureLogTable(c, logTable, dialect) finally c.close()
    val aligned = Evolve.align(df, target)
    val sql = insertSql(table, target, dialect)
    val q = dialect.quote
    val markerCheck = s"SELECT COUNT(*) FROM $logTable WHERE ${q("batch_id")} = ? " +
      s"AND ${q("partition_id")} = ?"
    val markerPut = s"INSERT INTO $logTable (${q("batch_id")}, ${q("partition_id")}) " +
      "VALUES (?, ?)"
    aligned.foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val conn = connect(url)
      try {
        conn.setAutoCommit(false)
        try {
          val chk = conn.prepareStatement(markerCheck)
          chk.setLong(1, batchId); chk.setInt(2, pid)
          val rs = chk.executeQuery(); rs.next()
          val seen = rs.getInt(1) > 0
          rs.close(); chk.close()
          if (!seen) {
            // claim first: under a racing attempt this blocks on the
            // winner's row lock, then throws duplicate-key → skip below
            val put = conn.prepareStatement(markerPut)
            try { put.setLong(1, batchId); put.setInt(2, pid); put.executeUpdate() }
            finally put.close()
            insertBatches(conn, sql, target, it, batchSize)
          }
          conn.commit()
        } catch {
          case e: java.sql.SQLException if isDuplicateKey(e) =>
            conn.rollback() // lost the claim race: winner's rows are committed
          case e: Throwable => conn.rollback(); throw e
        }
      } finally conn.close()
    }
  }

  /** The whole St6 guarantee hangs on the log table's PRIMARY KEY, so an
    * existing table is VERIFIED, not trusted: one created by a pre-PK
    * version of this sink (or by hand) gets the constraint retrofitted via
    * `ALTER TABLE ADD CONSTRAINT`; if that fails (e.g. nullable columns,
    * or duplicate markers already present) we fail loudly rather than run
    * with silently-disabled race protection. */
  private def ensureLogTable(c: Connection, logTable: String, dialect: Dialect): Unit = {
    val q = dialect.quote
    if (tableSchema(c, logTable).isEmpty) {
      val st = c.createStatement()
      try st.execute(s"CREATE TABLE $logTable " +
        s"(${q("batch_id")} BIGINT NOT NULL, " +
        s"${q("partition_id")} INT NOT NULL, " +
        s"PRIMARY KEY (${q("batch_id")}, ${q("partition_id")}))")
      finally st.close()
    } else {
      // Resolve the STORED identifier case before the PK lookup:
      // getPrimaryKeys matches the catalog's stored name exactly, and
      // databases disagree on folding (Derby/Oracle store upper, MySQL on
      // Linux and Postgres store lower). Probing only the upper-case form
      // would miss an existing PK there, and the retrofit ALTER below would
      // then fail on a healthy table. Mixed-case answers are covered by
      // also probing the name as given.
      val md = c.getMetaData
      val candidates =
        if (md.storesUpperCaseIdentifiers()) Seq(logTable.toUpperCase)
        else if (md.storesLowerCaseIdentifiers()) Seq(logTable.toLowerCase)
        else Seq(logTable, logTable.toUpperCase, logTable.toLowerCase)
      val hasPk = candidates.distinct.exists { name =>
        val rs = md.getPrimaryKeys(null, null, name)
        try rs.next() finally rs.close()
      }
      if (!hasPk) {
        val st = c.createStatement()
        try st.execute(s"ALTER TABLE $logTable ADD CONSTRAINT " +
          s"${logTable.toUpperCase}_PK PRIMARY KEY (${q("batch_id")}, ${q("partition_id")})")
        catch {
          case e: java.sql.SQLException => throw new IllegalStateException(
            s"$logTable exists without a PRIMARY KEY and one could not be " +
              "added; exactly-once claim protection would be silently " +
              "disabled — drop or fix the log table", e)
        } finally st.close()
      }
    }
  }

  /** ANSI SQLState 23505 (unique violation) or the JDBC4 exception class —
    * covers Derby and MySQL. */
  private def isDuplicateKey(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      e.getSQLState == "23505" ||
      Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null).take(5).exists {
        case s: java.sql.SQLException =>
          s.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
            s.getSQLState == "23505"
        case _ => false
      }

  private def evolveAndTarget(df: DataFrame, url: String, table: String,
      dialect: Dialect): StructType = {
    val conn = connect(url)
    try {
      ensureEvolved(conn, table, df.schema, dialect)
      tableSchema(conn, table).get
    } finally conn.close()
  }

  private def inTxn(url: String)(body: Connection => Unit): Unit = {
    val conn = connect(url)
    try {
      conn.setAutoCommit(false)
      try { body(conn); conn.commit() }
      catch { case e: Throwable => conn.rollback(); throw e }
    } finally conn.close()
  }

  private def insertBatches(conn: Connection, sql: String, target: StructType,
      it: Iterator[Row], batchSize: Int): Unit = {
    val ps = conn.prepareStatement(sql)
    try {
      var n = 0
      it.foreach { row =>
        var i = 1
        target.fields.foreach { f => bind(ps, i, f.dataType, row); i += 1 }
        ps.addBatch()
        n += 1
        if (n % batchSize == 0) ps.executeBatch()
      }
      if (n % batchSize != 0) ps.executeBatch()
    } finally ps.close()
  }
}
