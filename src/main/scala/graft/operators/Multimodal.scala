package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder brief):
  * media are opaque `binary` columns + a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * transforms.
  *
  * HEADER decode is REAL: [[graft.functions.ImageHeader]] parses
  * format + pixel dimensions from actual PNG/JPEG/GIF byte layouts
  * (pure JVM), exposed both as the `image_meta` expression
  * (`media_decode` row, oracle-checked against synthesized real headers)
  * and as the typed [[sniffMeta]] below.
  *
  * PIXEL decode is REAL too: [[decodePixels]] runs the stock JDK codec
  * (`javax.imageio.ImageIO`, headless — readers for PNG/JPEG/GIF/BMP/
  * TIFF/WBMP ship with the JVM) per partition and emits decoded
  * width/height, per-channel means, and a downsampled mean-gray
  * thumbnail. Decode failures follow the [[graft.functions.ImageHeader]]
  * error-sentinel contract (rows, never exceptions): unrecognized bytes
  * → `unsupported_format`, a recognized stream cut short →
  * `truncated`. The `media_pixels` oracle row proves the decode against
  * in-plan SYNTHESIZED real PNGs ([[synthAsset]]): pixels follow a
  * closed-form rule the DuckDB oracle recomputes independently, and PNG
  * is lossless, so a hash-green row means the codec round-tripped every
  * pixel bit-exactly.
  *
  * Scale: content bytes stay columnar; per-partition iteration means
  * decode parallelism = partition count; codec init (disk-cache off)
  * happens once per partition, not per row; frame sampling is a pure
  * generator (no shuffle). Partition by asset id ranges so one executor's
  * batch fits memory (`spark.sql.files.maxPartitionBytes` for the read
  * side).
  */
object Multimodal {

  final case class AssetMeta(format: String, width: Int, height: Int, durationMs: Long)
  final case class Asset(id: Long, content: Array[Byte], meta: AssetMeta)

  /** Real decoded-pixel features: dimensions read from the DECODED image
    * (not the stored meta — bytes over upstream metadata), exact
    * per-channel means (integer sums divided once, so the double is
    * reproducible across engines), and a `gw`×`gh` mean-gray thumbnail.
    * `err` is the sentinel column; feature fields are null when set. */
  final case class PixelFeatures(id: Long, width: Option[Int], height: Option[Int],
      rMean: Option[Double], gMean: Option[Double], bMean: Option[Double],
      thumb: Option[Seq[Double]], err: Option[String])

  /** Aspect-preserving thumbnail dimensions (integer math only). */
  def thumbDims(w: Int, h: Int, maxDim: Int): (Int, Int) =
    if (w <= maxDim && h <= maxDim) (w, h)
    else if (w >= h) (maxDim, math.max(1, h * maxDim / w))
    else (math.max(1, w * maxDim / h), maxDim)

  /** Header metadata sniffed from the CONTENT BYTES — the typed twin of
    * the `image_meta` expression: format and dimensions read from the
    * asset's own PNG/JPEG/GIF byte layout, the stored `meta` struct
    * ignored (real pipelines trust bytes over upstream metadata); a
    * corrupt or truncated header lands as the `err` sentinel column,
    * never an exception. */
  final case class SniffedMeta(id: Long, format: Option[String],
      width: Option[Int], height: Option[Int], err: Option[String])

  def sniffMeta(assets: Dataset[Asset]): Dataset[SniffedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (fmt, w, h, err) = graft.functions.ImageHeader.parse(a.content)
        SniffedMeta(a.id, Option(fmt), Option(w).map(_.intValue()),
          Option(h).map(_.intValue()), Option(err))
      }
    }
  }

  /** Deterministic pixel rule shared by [[synthAsset]], the
    * `media_pixels` DuckDB oracle, and the specs: packed RGB at (x, y)
    * for asset `id`. Linear in id/x/y mod 256, so an engine-independent
    * SQL twin can recompute channel sums in closed form. */
  def ruleRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((id + 3L * x + 7L * y) % 256).toInt
    val g = ((2L * id + 5L * x + y) % 256).toInt
    val b = ((id + x + 11L * y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Rule-driven asset dimensions: small enough that an oracle can
    * enumerate every pixel, varied enough to exercise non-square shapes. */
  def ruleDims(id: Long): (Int, Int) = (((id % 16) + 1).toInt, ((id % 13) + 1).toInt)

  /** Encode a REAL image through any stock-JDK writer (`png`, `gif`,
    * `bmp`, `jpg`, ...) whose pixels follow `rgb`. Losslessness is
    * format-dependent: PNG and 24-bit BMP round-trip any rule bit-exact;
    * GIF is exact only when the image holds ≤ 256 distinct colors (the
    * writer's palette can then represent every pixel); JPEG is lossy by
    * design, so only dimensions and approximate means survive. */
  def encodeImage(fmt: String, w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no JDK writer for format '$fmt'")
    bos.toByteArray
  }

  /** Encode a REAL PNG (stock JDK writer) whose pixels follow `rgb`. */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] =
    encodeImage("png", w, h, rgb)

  /** In-plan synthesized asset for the `media_pixels` oracle row:
    * `id % 8 == 7` → a PNG cut off mid-header (decode must land
    * `truncated`), `id % 8 == 3` → garbage bytes (`unsupported_format`),
    * otherwise a complete real PNG of [[ruleDims]] × [[ruleRgb]]. */
  def synthAsset(id: Long): Asset = {
    val (w, h) = ruleDims(id)
    val png = encodePng(w, h, (x, y) => ruleRgb(id, x, y))
    val bytes =
      if (id % 8 == 7) java.util.Arrays.copyOf(png, 25)
      else if (id % 8 == 3) s"BAD!garbage-$id".getBytes("US-ASCII")
      else png
    Asset(id, bytes, AssetMeta("png", w, h, 0L))
  }

  /** `gw`×`gh` mean-gray thumbnail of a decoded image: each cell is the
    * mean of (r+g+b)/3 over its pixel block (grid cell of pixel x =
    * `x * gw / width`, integer floor — a real box-downsample). Integer
    * sums, one double division per cell. */
  def thumbGray(img: BufferedImage, gw: Int, gh: Int): Seq[Double] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val cy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val cx = math.min(gw - 1, x * gw / w)
        val p = img.getRGB(x, y)
        sums(cy * gw + cx) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        counts(cy * gw + cx) += 1
        x += 1
      }
      y += 1
    }
    (0 until gw * gh).map(i => if (counts(i) == 0) 0.0 else sums(i).toDouble / (3.0 * counts(i)))
  }

  /** REAL pixel decode + feature extraction via the stock JDK codec.
    * Per-partition init (disk cache off) happens once; each asset's bytes
    * decode independently so parallelism = partition count. Error
    * sentinel, not exception: bytes no reader recognizes →
    * `unsupported_format`; a recognized stream that dies mid-decode
    * (PNG reader throws `IIOException` on EOF) → `truncated`. */
  def decodePixels(assets: Dataset[Asset], thumbGrid: Int = 2): Dataset[PixelFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      ImageIO.setUseCache(false) // once per partition: no temp-file cache
      it.map(a => decodeOne(a.id, a.content, thumbGrid))
    }
  }

  /** One asset through the codec, classified per the sentinel contract. */
  def decodeOne(id: Long, bytes: Array[Byte], thumbGrid: Int): PixelFeatures = {
    if (bytes == null || bytes.length < 2)
      return PixelFeatures(id, None, None, None, None, None, None,
        Some(graft.functions.ImageHeader.Truncated))
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        PixelFeatures(id, None, None, None, None, None, None,
          Some(graft.functions.ImageHeader.Unsupported))
      else {
        val w = img.getWidth; val h = img.getHeight
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        PixelFeatures(id, Some(w), Some(h),
          Some(rs.toDouble / n), Some(gs.toDouble / n), Some(bs.toDouble / n),
          Some(thumbGray(img, thumbGrid, thumbGrid)), None)
      }
    } catch {
      // the codec recognized the container but the stream lied about its
      // own length — the reference's quarantine row, not a task failure
      case _: Exception =>
        PixelFeatures(id, None, None, None, None, None, None,
          Some(graft.functions.ImageHeader.Truncated))
    }
  }

  /** Fixed-stride byte-range "frames" of a binary column — the video
    * frame-sampling plumbing (a real codec substitutes keyframe offsets
    * for the fixed stride). Pure expressions: sequence + substr, then one
    * posexplode. */
  def frameColumns(content: Column, frameBytes: Int): Column = {
    val nFrames = ceil(length(content) / lit(frameBytes.toDouble)).cast("long")
    // guard zero-length content: sequence(0, -1) would produce the
    // DESCENDING array [0, -1] (Spark defaults to step -1), not empty
    when(nFrames > 0,
      transform(sequence(lit(0L), nFrames - 1),
        i => content.substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.BinaryType)))
  }

  /** Explode an asset table into (id, frame_idx, frame) rows. */
  def frameSample(df: DataFrame, idCol: String, contentCol: String,
      frameBytes: Int): DataFrame =
    df.select(col(idCol),
      posexplode(frameColumns(col(contentCol), frameBytes)).as(Seq("frame_idx", "frame")))
      .withColumn("frame_idx", col("frame_idx").cast("long"))
}
