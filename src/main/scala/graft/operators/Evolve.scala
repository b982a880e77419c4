package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-batch schema evolution (SURVEY §1.3, §2.2 K4 — `Utils/sql.py:5-69`).
  *
  * The reference sink discovers the union of keys in each batch, ALTERs the
  * target table for novel columns (type inferred from the first row that
  * carries the key), and null-pads every row to the table's column order.
  * Quirk deliberately FIXED here (documented divergence, SURVEY §7.2 step 4):
  * the reference drops a new column's values for the batch that introduces
  * it (`sql.py:26,35-39` captures `existing_columns` before the ALTER);
  * this engine keeps them — `unionByName(allowMissingColumns=true)` pads
  * the OLD rows instead.
  *
  * All driver-side schema arithmetic + one narrow projection per batch —
  * no shuffle, no data rewrite.
  */
object Evolve {

  /** Widen two scalar types the way the reference's value-by-value
    * inference would across rows (`sql.py:46-62`): INT ⊔ BIGINT = BIGINT,
    * any numeric ⊔ DECIMAL/DOUBLE = DOUBLE, mixed scalar kinds = STRING
    * (its VARCHAR fallback; also how "Error503"-in-a-numeric-column
    * batches reconcile, `api.py:228-239`). */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, x) => x
    case (x, NullType) => x
    case (x, y) if isIntegral(x) && isIntegral(y) =>
      if (Seq(x, y).contains(LongType)) LongType
      else if (Seq(x, y).contains(IntegerType)) IntegerType else ShortType
    case (x: NumericType, y: NumericType) => DoubleType
    case (TimestampType, DateType) | (DateType, TimestampType) => TimestampType
    case _ => StringType
  }

  private def isIntegral(dt: DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType

  /** Merged schema of many batches: union of columns in first-seen order,
    * types widened pairwise. */
  def mergeSchemas(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    for (s <- schemas; f <- s.fields)
      order(f.name) = order.get(f.name).map(widen(_, f.dataType)).getOrElse(f.dataType)
    StructType(order.map { case (n, t) => StructField(n, t, nullable = true) }.toSeq)
  }

  /** Align one batch to the merged schema: cast present columns, null-pad
    * missing ones (P8 `align_row_data`, `sql.py:21-22`). Name matching is
    * case-INsensitive (Spark's default resolution) so a target read back
    * from case-folding JDBC metadata (Derby uppercases unquoted
    * identifiers) still binds the batch's columns instead of silently
    * null-padding everything. */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val byFolded = df.columns.groupBy(_.toLowerCase)
    val collisions = byFolded.collect { case (_, vs) if vs.length > 1 => vs.mkString("/") }
    require(collisions.isEmpty,
      s"batch has columns differing only in case — cannot align unambiguously: ${collisions.mkString(", ")}")
    df.select(target.fields.map { f =>
      // bind by the batch's EXACT column name (not the target's case) so
      // resolution also works under spark.sql.caseSensitive=true
      byFolded.get(f.name.toLowerCase).map(_.head) match {
        case Some(exact) => col(exact).cast(f.dataType).as(f.name)
        case None        => lit(null).cast(f.dataType).as(f.name)
      }
    }.toSeq: _*)
  }

  /** Schema-evolving union of batches — the engine's K4. */
  def unionEvolve(batches: Seq[DataFrame]): DataFrame = {
    val target = mergeSchemas(batches.map(_.schema))
    batches.map(align(_, target)).reduce(_ union _)
  }

  /** Spark type → reference DDL type (`infer_column_data_type`,
    * `sql.py:46-62`; SURVEY §1.2 table). */
  def toDdlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType | DoubleType => "DECIMAL(10,2)"
    case _: DecimalType => "DECIMAL(10,2)"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(255)"
    case NullType => "TEXT"
    case TimestampType | DateType => "VARCHAR(255)"
    case _ => "VARCHAR(255)"
  }

  /** `ALTER TABLE ... ADD COLUMN` statements for columns `incoming` has but
    * `existing` lacks (`sql.py:5-19` diff vs DESCRIBE). Identifier quoting
    * and the type map are injectable so the same diff drives both the
    * reference-faithful MySQL emission (default) and a live dialect (see
    * [[graft.sinks.JdbcSink.Derby]]). */
  def alterStatements(table: String, existing: StructType, incoming: StructType,
      quote: String => String = n => s"`$n`",
      typeName: DataType => String = toDdlType): Seq[String] =
    incoming.fields.toSeq
      // case-insensitive diff: a live table created with unquoted
      // identifiers reports case-folded names (Derby: uppercase); treating
      // "K" as missing "k" would re-add a quoted duplicate column
      .filterNot(f => existing.fieldNames.exists(_.equalsIgnoreCase(f.name)))
      .map(f => s"ALTER TABLE $table ADD COLUMN ${quote(f.name)} ${typeName(f.dataType)}")

  /** `CREATE TABLE` DDL for a schema (sink bootstrap). */
  def createTableDdl(table: String, schema: StructType,
      quote: String => String = n => s"`$n`",
      typeName: DataType => String = toDdlType): String =
    schema.fields.map(f => s"${quote(f.name)} ${typeName(f.dataType)}")
      .mkString(s"CREATE TABLE $table (", ", ", ")")
}
