package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder brief):
  * media are opaque `binary` columns + a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * transforms.
  *
  * HEADER decode is REAL: [[graft.functions.ImageHeader]] parses
  * format + pixel dimensions from actual PNG/JPEG/GIF byte layouts
  * (pure JVM, no codec library), exposed both as the `image_meta`
  * expression (`media_decode` row, oracle-checked against synthesized
  * real headers) and as the typed [[sniffMeta]] below. PIXEL decode
  * stays STUBBED — this environment ships no codec libraries — with a
  * deterministic fake (rolling byte fingerprint). What is also real and
  * tested: the schema, the typed encoders, the mapPartitions batch
  * shape (codec init once per partition, not per row), and the
  * expression-level paths (resize math, frame slicing) that never leave
  * codegen.
  *
  * Scale: content bytes stay columnar; per-partition iteration means
  * decode parallelism = partition count; frame sampling is a pure
  * generator (no shuffle). Partition by asset id ranges so one executor's
  * batch fits memory (`spark.sql.files.maxPartitionBytes` for the read
  * side).
  */
object Multimodal {

  final case class AssetMeta(format: String, width: Int, height: Int, durationMs: Long)
  final case class Asset(id: Long, content: Array[Byte], meta: AssetMeta)
  final case class AssetFeatures(id: Long, nBytes: Int, byteFingerprint: Long,
      format: String, thumbW: Int, thumbH: Int)

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

  /** STUB decode + feature extraction — a production build replaces the
    * body of the `map` with the codec call; everything around it (typed
    * Dataset in/out, per-partition init point, batch iteration) is the
    * real plumbing. Header-level metadata no longer needs this seam at
    * all ([[sniffMeta]] reads it off the bytes). */
  def decodeStub(assets: Dataset[Asset], thumbMax: Int = 64): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition codec initialization would happen HERE, once
      it.map { a =>
        val fp = a.content.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        val (tw, th) = thumbDims(a.meta.width, a.meta.height, thumbMax)
        AssetFeatures(a.id, a.content.length, fp, a.meta.format, tw, th)
      }
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
