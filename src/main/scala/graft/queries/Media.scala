package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** Multimodal-column queries (builder brief): binary content + metadata,
  * exercised over `documents` (text bytes stand in for media bytes — the
  * decode stub is environment-imposed; the column plumbing is real and
  * oracle-checked). */
object Media {

  /** Binary ingestion + metadata extraction: content as a binary column,
    * byte length, content hash, frame count, and an aspect-preserved
    * thumbnail width — all pure expressions over the binary column. */
  val multimodalMeta = Q("multimodal_meta", (s, d) => {
    import s.implicits._
    val bin = $"text".cast("binary")
    Tables.documents(s, d).select(
      $"doc_id",
      length(bin).as("n_bytes"),
      sha2(bin, 256).as("content_sha"),
      ceil(length(bin) / lit(64.0)).cast("long").as("frame_count"),
      least($"n_chars", lit(64L)).as("thumb_w"))
  }, Some("""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      sha256(text) AS content_sha,
      CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS frame_count,
      least(n_chars, 64) AS thumb_w
    FROM documents ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Frame sampling as rows: fixed-stride byte ranges of the binary
    * content, posexploded to (doc_id, frame_idx, frame) — the shape a
    * video pipeline fans out to per-frame feature extraction. The frame is
    * projected as `hex(...)` so the oracle harness can sort and hash it
    * (raw binary is unhashable in the pandas comparator); the production
    * path keeps the raw bytes (`Multimodal.frameSample`). */
  val frameSample = Q("frame_sample", (s, d) => {
    import s.implicits._
    val assets = Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("content"))
    Multimodal.frameSample(assets, "doc_id", "content", 64)
      .withColumn("frame", hex($"frame"))
  }, Some("""
    SELECT doc_id, i AS frame_idx,
           hex(encode(substring(text, CAST(i * 64 + 1 AS INTEGER), 64))) AS frame
    FROM documents,
         unnest(generate_series(0,
           CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) - 1)) AS t(i)
    ORDER BY doc_id, frame_idx"""),
    sortCols = Seq("doc_id", "frame_idx"))

  val all: Seq[Q] = Seq(multimodalMeta, frameSample)
}
