package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with typed metadata
  * structs; transforms are expressed over the binary + metadata so the
  * Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested even though actual codecs are absent in this environment.
  *
  * STUB NOTICE: `fakeDecodeMeta` derives metadata from a deterministic
  * header convention instead of a real image/audio decoder (no codec
  * libraries in this container). Swap `fakeDecodeMeta`/`fakeThumbnail` for
  * real kernels (JNI/opencv or mapInArrow batches) without touching any of
  * the surrounding plumbing.
  */
object Multimodal {

  /** Synthesize a media table from pages: payload = html bytes re-labeled
    * (deterministic stand-in), media_type from url hash, plus a 16-byte
    * fake header carrying (width, height) as big-endian ints.
    */
  def mediaFromPages(pages: DataFrame): DataFrame = {
    val w = (abs(xxhash64(col("url"))) % 1920 + 64).cast("int")
    val h = (abs(xxhash64(col("url"), lit(1))) % 1080 + 64).cast("int")
    pages.select(
      col("url"),
      element_at(typedlit(Seq("image/png", "image/jpeg", "audio/wav", "video/mp4")),
        (abs(xxhash64(col("url"), lit(2))) % 4).cast("int") + 1).as("media_type"),
      concat(
        // fake header: magic 'GRFT' + width + height (text ints, fixed sep)
        encode(concat_ws(":", lit("GRFT"), w.cast("string"), h.cast("string"), lit("|")), "UTF-8"),
        col("html")).as("payload"))
  }

  /** STUB decode: parse the fake header into typed metadata. A real decoder
    * would fill the same struct from actual container headers.
    */
  def fakeDecodeMeta(payload: Column): Column = {
    val head  = decode(substring(payload, 1, 32), "UTF-8")
    val parts = split(substring_index(head, "|", 1), ":")
    struct(
      try_element_at(parts, lit(2)).cast("int").as("width"),
      try_element_at(parts, lit(3)).cast("int").as("height"),
      (length(payload)).cast("long").as("n_bytes"))
  }

  /** STUB thumbnail/frame-sample: deterministic byte slice standing in for
    * a resize/frame-extract kernel; preserves the batch shape contract
    * (binary in → smaller binary out).
    */
  def fakeThumbnail(payload: Column, maxBytes: Int = 256): Column =
    substring(payload, 1, maxBytes)

  /** The pipeline shape: decode metadata → filter by shape/type → bucket by
    * size class for downstream batch-friendly partitioning.
    */
  def mediaFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("meta", fakeDecodeMeta(col("payload")))
      .withColumn("thumb", fakeThumbnail(col("payload")))
      .select(
        col("url"), col("media_type"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"),
        (col("meta.width") * col("meta.height")).as("pixels"),
        length(col("thumb")).cast("long").as("thumb_bytes"),
        when(col("meta.width") >= 1024, "large")
          .when(col("meta.width") >= 256, "medium")
          .otherwise("small").as("size_class"))
}
