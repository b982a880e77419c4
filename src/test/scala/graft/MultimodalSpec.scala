package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Asset, AssetMeta}

/** Multimodal plumbing: REAL pixel decode (stock JDK codec), thumbnail
  * math, frame slicing, header sniffing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // ---- real pixel decode (javax.imageio) --------------------------------

  test("decodePixels: real PNG round-trips bit-exactly through the JDK codec") {
    val ids = Seq(0L, 1L, 2L, 4L, 42L, 100L) // none hit the %8 failure variants
    val out = Multimodal.decodePixels(ids.map(Multimodal.synthAsset).toDS())
      .collect().map(f => f.id -> f).toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.ruleDims(id)
      val f = out(id)
      assert(f.err.isEmpty && f.width.contains(w) && f.height.contains(h))
      // recompute exact channel sums from the pixel rule — independent of
      // the codec path entirely
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.ruleRgb(id, x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
      }
      val n = w.toLong * h
      assert(f.rMean.contains(rs.toDouble / n), s"r mean for id=$id")
      assert(f.gMean.contains(gs.toDouble / n), s"g mean for id=$id")
      assert(f.bMean.contains(bs.toDouble / n), s"b mean for id=$id")
    }
  }

  test("decodePixels: corrupt / truncated / empty bytes land as err sentinel rows") {
    import graft.functions.ImageHeader
    val png = Multimodal.encodePng(6, 4, (x, y) => Multimodal.ruleRgb(9L, x, y))
    val cases = Seq(
      Asset(1L, "BAD!not an image at all".getBytes("US-ASCII"), AssetMeta("?", 0, 0, 0L)),
      Asset(2L, java.util.Arrays.copyOf(png, 25), AssetMeta("png", 6, 4, 0L)),   // header cut short
      Asset(3L, java.util.Arrays.copyOf(png, png.length / 2), AssetMeta("png", 6, 4, 0L)), // mid-IDAT
      Asset(4L, Array.empty[Byte], AssetMeta("mp4", 0, 0, 0L)),
      Asset(5L, null, AssetMeta("mp4", 0, 0, 0L)),
      Asset(6L, png, AssetMeta("png", 6, 4, 0L))) // control: decodes fine
    val out = Multimodal.decodePixels(cases.toDS()).collect().map(f => f.id -> f).toMap
    assert(out(1L).err.contains(ImageHeader.Unsupported))
    assert(out(2L).err.contains(ImageHeader.Truncated))
    assert(out(3L).err.contains(ImageHeader.Truncated))
    assert(out(4L).err.contains(ImageHeader.Truncated))
    assert(out(5L).err.contains(ImageHeader.Truncated))
    Seq(1L, 2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id).width.isEmpty && out(id).rMean.isEmpty && out(id).thumb.isEmpty)
    }
    assert(out(6L).err.isEmpty && out(6L).width.contains(6) && out(6L).height.contains(4))
  }

  test("decodePixels: real GIF and BMP bytes decode losslessly; JPEG dims exact, means near") {
    // gray rule (r = g = b): ≤ 256 distinct colors, so the GIF writer's
    // palette represents every pixel exactly; 24-bit BMP is lossless for
    // any rule. Expected means recomputed from the rule, independent of
    // every codec path.
    def gray(x: Int, y: Int): Int = {
      val v = ((5L + 3L * x + 7L * y) % 256).toInt
      (v << 16) | (v << 8) | v
    }
    val (w, h) = (11, 7)
    val exp = (for (y <- 0 until h; x <- 0 until w) yield (gray(x, y) & 0xff).toLong)
      .sum.toDouble / (w * h)
    for (fmt <- Seq("gif", "bmp")) {
      val bytes = Multimodal.encodeImage(fmt, w, h, gray)
      val f = Multimodal.decodePixels(
        Seq(Asset(1L, bytes, AssetMeta(fmt, w, h, 0L))).toDS()).collect().head
      assert(f.err.isEmpty, s"$fmt decode errored: ${f.err}")
      assert(f.width.contains(w) && f.height.contains(h), s"$fmt dims")
      assert(f.rMean.contains(exp) && f.gMean.contains(exp) && f.bMean.contains(exp),
        s"$fmt means: got (${f.rMean}, ${f.gMean}, ${f.bMean}), want $exp")
    }
    // JPEG: lossy by contract — dimensions are exact, channel means land
    // within a small codec tolerance of the rule (gray ramps compress
    // benignly), and no err sentinel fires on a well-formed stream
    val jb = Multimodal.encodeImage("jpg", 16, 12, gray)
    val jexp = (for (y <- 0 until 12; x <- 0 until 16) yield (gray(x, y) & 0xff).toLong)
      .sum.toDouble / (16 * 12)
    val jf = Multimodal.decodePixels(
      Seq(Asset(2L, jb, AssetMeta("jpeg", 16, 12, 0L))).toDS()).collect().head
    assert(jf.err.isEmpty && jf.width.contains(16) && jf.height.contains(12))
    Seq(jf.rMean, jf.gMean, jf.bMean).foreach { m =>
      assert(m.exists(v => math.abs(v - jexp) <= 8.0),
        s"jpeg mean $m strayed > 8 from rule mean $jexp")
    }
  }

  test("thumbGray: 2x2 box-downsample means computed from decoded pixels") {
    // 4x4 image, four uniform quadrants with known grays
    val quadGray = Array(Array(30, 60), Array(90, 120)) // [cy][cx]
    val png = Multimodal.encodePng(4, 4, (x, y) => {
      val g = quadGray(y / 2)(x / 2)
      (g << 16) | (g << 8) | g
    })
    val out = Multimodal.decodePixels(Seq(
      Asset(7L, png, AssetMeta("png", 4, 4, 0L))).toDS(), thumbGrid = 2)
      .collect().head
    assert(out.thumb.contains(Seq(30.0, 60.0, 90.0, 120.0)))
  }

  test("thumbDims preserves aspect, never upsizes, never hits zero") {
    assert(Multimodal.thumbDims(1920, 1080, 64) == ((64, 36)))
    assert(Multimodal.thumbDims(1080, 1920, 64) == ((36, 64)))
    assert(Multimodal.thumbDims(30, 20, 64) == ((30, 20)))
    assert(Multimodal.thumbDims(10000, 1, 64) == ((64, 1)))
  }

  test("frameSample slices the binary into fixed-stride frames") {
    val df = Seq((1L, "aaaabbbbcc".getBytes("UTF-8"))).toDF("id", "content")
    val frames = Multimodal.frameSample(df, "id", "content", 4)
      .collect().map(r => (r.getLong(1), new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    assert(frames.toSeq == Seq((0L, "aaaa"), (1L, "bbbb"), (2L, "cc")))
  }

  test("frameSample emits ZERO frames for empty content (no descending-sequence ghost frames)") {
    val df = Seq((1L, Array.empty[Byte]), (2L, "ab".getBytes("UTF-8"))).toDF("id", "content")
    val frames = Multimodal.frameSample(df, "id", "content", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSeq == Seq((2L, 0L)))
  }

  // ---- real header decode (hand-built byte layouts, independent of the
  // media_decode query's SQL synthesis path) -----------------------------

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** A minimal real PNG header: signature + IHDR with the given dims. */
  private def pngBytes(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 0x0d) ++ "IHDR".getBytes("US-ASCII") ++
      bytes(w >>> 24, w >>> 16, w >>> 8, w, h >>> 24, h >>> 16, h >>> 8, h) ++
      bytes(8, 6, 0, 0, 0)

  /** A minimal real JPEG: SOI, an APP0 segment to force the marker walk,
    * then SOF0 with the dims. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, len 4 (walked over)
      0xff, 0xc0, 0x00, 0x11, 0x08,       // SOF0, len 17, precision 8
      h >>> 8, h, w >>> 8, w, 0x03)

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      bytes(w & 0xff, w >>> 8, h & 0xff, h >>> 8, 0) // little-endian dims

  test("ImageHeader.parse reads real PNG/JPEG/GIF byte layouts") {
    assert(graft.functions.ImageHeader.parse(pngBytes(1920, 1080)) ==
      (("png", 1920, 1080, null)))
    assert(graft.functions.ImageHeader.parse(jpegBytes(640, 480)) ==
      (("jpeg", 640, 480, null)))
    assert(graft.functions.ImageHeader.parse(gifBytes(320, 200)) ==
      (("gif", 320, 200, null)))
    // 2-byte dims exercise both endiannesses past one byte
    assert(graft.functions.ImageHeader.parse(gifBytes(0x1234, 0x0102)) ==
      (("gif", 0x1234, 0x0102, null)))
    assert(graft.functions.ImageHeader.parse(jpegBytes(0x1234, 0x0102)) ==
      (("jpeg", 0x1234, 0x0102, null)))
  }

  test("ImageHeader.parse surfaces corruption as the err sentinel, never an exception") {
    import graft.functions.ImageHeader
    assert(ImageHeader.parse("not an image".getBytes("UTF-8")) ==
      ((null, null, null, ImageHeader.Unsupported)))
    assert(ImageHeader.parse(pngBytes(64, 64).take(10)) ==
      ((null, null, null, ImageHeader.Truncated)))
    assert(ImageHeader.parse(jpegBytes(64, 64).take(6)) ==
      ((null, null, null, ImageHeader.Truncated)))
    assert(ImageHeader.parse("GIF".getBytes("US-ASCII")) ==
      ((null, null, null, ImageHeader.Truncated)))
    assert(ImageHeader.parse("GIF99a0123".getBytes("US-ASCII")) ==
      ((null, null, null, ImageHeader.Unsupported)))
    assert(ImageHeader.parse(Array.empty[Byte]) ==
      ((null, null, null, ImageHeader.Truncated)))
    // PNG first byte, wrong rest of signature
    assert(ImageHeader.parse(bytes(0x89, 0x50, 0, 0, 0, 0, 0, 0, 0, 0)) ==
      ((null, null, null, ImageHeader.Unsupported)))
    // JPEG whose scan starts before any SOF: dimensions unavailable
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)) ==
      ((null, null, null, ImageHeader.Truncated)))
  }

  test("sniffMeta: typed header decode off the bytes; err rows stay rows") {
    val mixed = Seq(
      Asset(1L, pngBytes(800, 600), AssetMeta("claims-jpeg", 1, 1, 0L)),
      Asset(2L, "garbage".getBytes("UTF-8"), AssetMeta("png", 9, 9, 0L)),
      Asset(3L, gifBytes(12, 34), AssetMeta("gif", 12, 34, 0L)))
    val out = Multimodal.sniffMeta(mixed.toDS()).collect().map(m => m.id -> m).toMap
    // bytes win over the stored meta struct
    assert(out(1L) == Multimodal.SniffedMeta(1L, Some("png"), Some(800), Some(600), None))
    assert(out(2L) == Multimodal.SniffedMeta(2L, None, None, None,
      Some(graft.functions.ImageHeader.Unsupported)))
    assert(out(3L) == Multimodal.SniffedMeta(3L, Some("gif"), Some(12), Some(34), None))
  }

  test("image_meta expression: codegen'd struct over a binary column") {
    val df = Seq(
      (1L, pngBytes(321, 123)),
      (2L, "junk".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val out = df.selectExpr("id", "image_meta(content) AS m")
      .selectExpr("id", "m.format", "m.width", "m.height", "m.err")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) null else r.getInt(2),
          if (r.isNullAt(3)) null else r.getInt(3), r.getString(4))).toMap
    assert(out(1L) == (("png", 321, 123, null)))
    assert(out(2L) == ((null, null, null, graft.functions.ImageHeader.Unsupported)))
    // NULL content → NULL struct (nullSafeEval), so all fields null
    assert(out(3L) == ((null, null, null, null)))
  }
}
