package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image HEADER decode — container format + pixel dimensions
  * parsed from the file's own byte layout, no codec involved. Full PIXEL
  * decode lives in [[graft.operators.Multimodal.decodePixels]] (stock JDK
  * `javax.imageio`); this header path exists because format sniffing and
  * dimension extraction are metadata reads every real pipeline does
  * BEFORE deciding to decode — size filters, aspect filters, format
  * routing — and they only need the first few dozen bytes, never the
  * codec.
  *
  * Formats (public byte-layout specs):
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
  *    chunk — width/height as big-endian u32 at offsets 16/20.
  *  - JPEG: `FF D8` SOI, then a marker walk: each segment is
  *    `FF <marker> <len:2 BE>`; the frame header (SOF0–SOF15, minus the
  *    DHT/JPG/DAC exceptions C4/C8/CC) carries height/width as
  *    big-endian u16 at segment offsets 3/5.
  *  - GIF: `GIF87a`/`GIF89a`, then width/height as LITTLE-endian u16 at
  *    offsets 6/8.
  *
  * Error SENTINEL, not exception (the reference's error-column semantic,
  * `Utils/api.py:228-239`): a bad magic number yields
  * `err = "unsupported_format"`, a recognized magic cut short yields
  * `err = "truncated"`, and format/width/height are null — corrupt
  * assets stay ROWS that route to quarantine, they never kill the scan.
  */
object ImageHeader {

  val Unsupported = "unsupported_format"
  val Truncated = "truncated"

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** One parsed header: (format, width, height, err) with nulls per the
    * sentinel contract. Plain JVM types so generated code can call it. */
  def parse(b: Array[Byte]): (String, Integer, Integer, String) = {
    if (b == null || b.length < 2) return (null, null, null, Truncated)
    // PNG
    if (u8(b, 0) == 0x89 && b.length >= 2 && u8(b, 1) == 0x50) {
      if (b.length < 8 || (0 until 8).exists(i => u8(b, i) != PngSig(i)))
        return (null, null, null, Unsupported)
      // signature ok; need through IHDR data (offset 16..23) and the
      // chunk type "IHDR" at 12..15
      if (b.length < 24) return (null, null, null, Truncated)
      if (!(u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R'))
        return (null, null, null, Unsupported)
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        return (null, null, null, Unsupported)
      return ("png", w.toInt, h.toInt, null)
    }
    // JPEG
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var p = 2
      while (p + 1 < b.length) {
        if (u8(b, p) != 0xff) return (null, null, null, Unsupported)
        var q = p
        while (q + 1 < b.length && u8(b, q + 1) == 0xff) q += 1 // fill bytes
        val m = if (q + 1 < b.length) u8(b, q + 1) else return (null, null, null, Truncated)
        p = q + 2
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          // standalone marker, no segment body
        } else if (m == 0xd9 || m == 0xda) {
          // EOI / start-of-scan before any frame header: no dimensions
          return (null, null, null, Truncated)
        } else {
          if (p + 1 >= b.length) return (null, null, null, Truncated)
          val len = be16(b, p)
          if (len < 2) return (null, null, null, Unsupported)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (p + 6 >= b.length) return (null, null, null, Truncated)
            val h = be16(b, p + 3); val w = be16(b, p + 5)
            if (w <= 0 || h <= 0) return (null, null, null, Unsupported)
            return ("jpeg", w, h, null)
          }
          p += len
        }
      }
      return (null, null, null, Truncated)
    }
    // GIF
    if (b.length >= 3 && u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F') {
      if (b.length < 6) return (null, null, null, Truncated)
      val ver = new String(b, 3, 3, "US-ASCII")
      if (ver != "87a" && ver != "89a") return (null, null, null, Unsupported)
      if (b.length < 10) return (null, null, null, Truncated)
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) return (null, null, null, Unsupported)
      return ("gif", w, h, null)
    }
    (null, null, null, Unsupported)
  }

  /** [[parse]] boxed as an InternalRow for the expression / generated
    * code. */
  def parseRow(b: Array[Byte]): InternalRow = {
    val (fmt, w, h, err) = parse(b)
    new GenericInternalRow(Array[Any](
      if (fmt == null) null else UTF8String.fromString(fmt),
      if (w == null) null else w.intValue(),
      if (h == null) null else h.intValue(),
      if (err == null) null else UTF8String.fromString(err)))
  }

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("err", StringType, nullable = true)))
}

/** `image_meta(binary) → struct<format, width, height, err>` — the
  * [[ImageHeader]] parse as a codegen'd expression (one static call from
  * generated code, same idiom as [[TextKernels]]). NULL content → NULL
  * struct; corrupt content → the err sentinel INSIDE a non-null struct. */
case class ImageHeaderMeta(child: Expression) extends UnaryExpression {

  override def prettyName: String = "image_meta"
  override def dataType: DataType = ImageHeader.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageHeader.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ImageHeader.parseRow($c);")

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderMeta =
    copy(child = newChild)
}

object ImageHeaderMeta {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("image_meta"),
    new ExpressionInfo(classOf[ImageHeaderMeta].getName, "image_meta"),
    (children: Seq[Expression]) => {
      FunctionArity.check("image_meta", 1, children)
      ImageHeaderMeta(children.head)
    })
}
