package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride through the
  * pipeline as opaque `binary` columns with typed metadata structs.
  *
  * IMAGE decode is REAL: [[decodeImage]] reads width/height/format
  * from the blob's header via the JDK's own `javax.imageio`
  * (PNG/JPEG/GIF/BMP — no external library), as a native codegen'd
  * expression; [[synthImage]] renders real PNG/JPEG fixture bytes
  * distributed, so tests and oracles know each image's true metadata
  * from its id. AUDIO/VIDEO decode stays a documented deterministic
  * STUB (the JDK ships no codec for those): `fakeDecode*` derives
  * plausible metadata from the bytes, and a production deployment
  * swaps it for a real codec behind the same column signatures
  * without changing any surrounding plan.
  */
object Multimodal {

  /** Wrap text content as a fake payload blob (test-fixture generator:
    * gives every row a binary column without external data). */
  def asBlob(content: Column): Column = encode(content, "UTF-8")

  /** REAL image decode: header-only width/height/format via
    * javax.imageio ([[graft.functions.ImageMetaExpr]]); null for
    * undecodable bytes. Same struct shape as [[fakeDecodeImage]]. */
  def decodeImage(blob: Column): Column =
    graft.functions.ImageMetaExpr.imageMeta(blob)

  /** REAL image fixture generator: deterministic w×h PNG/JPEG bytes
    * ([[graft.functions.SynthImageExpr]]). */
  def synthImage(w: Column, h: Column, fmt: Column): Column =
    graft.functions.SynthImageExpr.synthImage(w, h, fmt)

  /** Deterministic hex slice of the blob's md5 as a long — the fake
    * codec's entropy source. md5-over-bytes is computable by any SQL
    * engine (DuckDB oracle parity), unlike xxhash64. */
  private def hashSlice(blob: Column, from: Int): Column =
    conv(substring(md5(blob), from, 6), 16, 10).cast("long")

  /** STUB image decode: deterministic fake metadata from the bytes.
    * Real impl: batch decoder over the binary column (same schema). */
  def fakeDecodeImage(blob: Column): Column = struct(
    octet_length(blob).as("n_bytes"),
    (pmod(hashSlice(blob, 1), lit(1920L)) + 1L).cast("int").as("width"),
    (pmod(hashSlice(blob, 7), lit(1080L)) + 1L).cast("int").as("height"),
    element_at(array(lit("png"), lit("jpeg"), lit("webp")),
      (pmod(hashSlice(blob, 13), lit(3L)) + 1L).cast("int")).as("format"))

  /** STUB resize: new dims, preserving aspect ratio metadata-side. */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h))
    struct(
      meta.getField("n_bytes").as("n_bytes"),
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      meta.getField("format").as("format"))
  }

  /** STUB video frame sampling: derive a deterministic frame count
    * from the blob, emit one row per sampled frame index (stride
    * sampling) — the real explode/partition shape of a frame pipeline. */
  def sampleFrames(df: DataFrame, blobCol: String, idCol: String,
      stride: Int): DataFrame = {
    val nFrames = (pmod(hashSlice(col(blobCol), 19), lit(240L)) + 1L).cast("int")
    df.select(col(idCol), nFrames.as("n_frames"),
        posexplode(sequence(lit(0), nFrames - 1, lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")
  }
}
