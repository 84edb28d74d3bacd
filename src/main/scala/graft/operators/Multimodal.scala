package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with typed metadata
  * structs.
  *
  * REAL decode surface: [[decodeMeta]] sniffs container magic bytes and
  * parses actual format headers — PNG signature + IHDR
  * (width/height/bit-depth/color-type, big-endian) and canonical RIFF/WAVE
  * fmt chunks (channels/sample-rate/bits, little-endian) — as pure
  * codegen'd byte expressions (substring/hex/conv), no UDF, no codec
  * library. This is the metadata-extraction stage of a real pipeline.
  *
  * STUB NOTICE (narrowed): only PIXEL/SAMPLE decode ([[fakeThumbnail]])
  * remains a stand-in — an actual resize/frame-extract kernel needs codec
  * libraries absent from this container; swap it in without touching the
  * plumbing. Everything else in this module parses or emits real bytes.
  */
object Multimodal {

  // ---- byte-level readers (1-based positions, Spark substring convention)

  /** Big-endian unsigned int from `len` bytes at `pos`. */
  def beUInt(b: Column, pos: Int, len: Int): Column =
    conv(hex(substring(b, pos, len)), 16, 10).cast("long")

  /** Little-endian unsigned int from `len` bytes at `pos`. */
  def leUInt(b: Column, pos: Int, len: Int): Column =
    conv(concat((len - 1 to 0 by -1).map(i => hex(substring(b, pos + i, 1))): _*), 16, 10)
      .cast("long")

  /** `n`-byte little-endian encoding of an integer column. */
  def leBytes(v: Column, n: Int): Column = {
    val h = lpad(hex(v), n * 2, "0")
    unhex(concat((n - 1 to 0 by -1).map(i => substring(h, i * 2 + 1, 2)): _*))
  }

  /** `n`-byte big-endian encoding of an integer column. */
  def beBytes(v: Column, n: Int): Column = unhex(lpad(hex(v), n * 2, "0"))

  val PngSig = "89504E470D0A1A0A"

  def isPng(b: Column): Column = hex(substring(b, 1, 8)) === PngSig
  def isWav(b: Column): Column =
    hex(substring(b, 1, 4)) === "52494646" && hex(substring(b, 9, 4)) === "57415645"

  /** Minimal-but-REAL PNG container: signature, IHDR chunk (length 13,
    * width/height big-endian, bit depth 8, color type 6 = RGBA,
    * deflate/adam7 flags 0, placeholder CRC), then the body bytes.
    */
  def pngPayload(w: Column, h: Column, body: Column): Column =
    concat(
      unhex(lit(PngSig)), unhex(lit("0000000D")), encode(lit("IHDR"), "UTF-8"),
      beBytes(w, 4), beBytes(h, 4),
      unhex(lit("0806000000")), unhex(lit("00000000")),
      body)

  /** Canonical 36-byte RIFF/WAVE PCM header (fmt chunk: format 1, given
    * channels + sample rate, 16-bit samples), then the body bytes.
    */
  def wavPayload(sampleRate: Column, channels: Column, body: Column): Column = {
    val byteRate   = sampleRate * channels * 2
    val blockAlign = channels * 2
    concat(
      encode(lit("RIFF"), "UTF-8"), leBytes(length(body) + 28, 4), encode(lit("WAVE"), "UTF-8"),
      encode(lit("fmt "), "UTF-8"), leBytes(lit(16), 4), leBytes(lit(1), 2),
      leBytes(channels, 2), leBytes(sampleRate, 4), leBytes(byteRate, 4),
      leBytes(blockAlign, 2), leBytes(lit(16), 2),
      body)
  }

  /** REAL header-level decode: sniff the magic, parse the container header.
    * PNG: IHDR width (bytes 17-20 BE), height (21-24), bit depth (25),
    * color type (26). WAV: channels (23-24 LE), sample rate (25-28 LE),
    * bits per sample (35-36 LE). Unknown containers → octet-stream with
    * null fields. Pure built-in expressions — whole-stage codegen'd.
    */
  def decodeMeta(payload: Column): Column =
    struct(
      when(isPng(payload), "image/png")
        .when(isWav(payload), "audio/wav")
        .otherwise("application/octet-stream").as("sniffed_type"),
      when(isPng(payload), beUInt(payload, 17, 4).cast("int")).as("width"),
      when(isPng(payload), beUInt(payload, 21, 4).cast("int")).as("height"),
      when(isPng(payload), beUInt(payload, 25, 1).cast("int")).as("bit_depth"),
      when(isPng(payload), beUInt(payload, 26, 1).cast("int")).as("color_type"),
      when(isWav(payload), leUInt(payload, 23, 2).cast("int")).as("channels"),
      when(isWav(payload), leUInt(payload, 25, 4).cast("int")).as("sample_rate"),
      when(isWav(payload), leUInt(payload, 35, 2).cast("int")).as("bits_per_sample"),
      length(payload).cast("long").as("n_bytes"))

  /** Synthesize a media table from pages: every page becomes a REAL
    * container — a PNG whose IHDR carries url-hash-derived dimensions, or a
    * RIFF/WAVE whose fmt chunk carries url-hash-derived audio params — with
    * the page's html bytes as the (undecodable, but honestly labeled) body.
    * [[decodeMeta]] then recovers the metadata by actually parsing the
    * headers, so the whole media path is real at the container level.
    */
  def mediaFromPages(pages: DataFrame): DataFrame = {
    val w  = (abs(xxhash64(col("url"))) % 1920 + 64).cast("int")
    val h  = (abs(xxhash64(col("url"), lit(1))) % 1080 + 64).cast("int")
    val sr = (abs(xxhash64(col("url"), lit(3))) % 40000 + 8000).cast("int")
    val ch = (abs(xxhash64(col("url"), lit(4))) % 2 + 1).cast("int")
    val isImg = abs(xxhash64(col("url"), lit(2))) % 2 === 0
    pages.select(
      col("url"),
      when(isImg, "image/png").otherwise("audio/wav").as("media_type"),
      when(isImg, pngPayload(w, h, col("html")))
        .otherwise(wavPayload(sr, ch, col("html"))).as("payload"))
  }

  /** STUB thumbnail/frame-sample: deterministic byte slice standing in for
    * a resize/frame-extract kernel (needs codec libs absent here);
    * preserves the batch shape contract (binary in → smaller binary out).
    */
  def fakeThumbnail(payload: Column, maxBytes: Int = 256): Column =
    substring(payload, 1, maxBytes)

  /** The pipeline shape: real header decode → typed metadata → bucket by
    * size class for downstream batch-friendly partitioning.
    */
  def mediaFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("meta", decodeMeta(col("payload")))
      .withColumn("thumb", fakeThumbnail(col("payload")))
      .select(
        col("url"), col("media_type"),
        col("meta.sniffed_type").as("sniffed_type"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.sample_rate").as("sample_rate"),
        col("meta.n_bytes").as("n_bytes"),
        (col("meta.width") * col("meta.height")).as("pixels"),
        length(col("thumb")).cast("long").as("thumb_bytes"),
        when(col("meta.width") >= 1024, "large")
          .when(col("meta.width") >= 256, "medium")
          .when(col("meta.width").isNotNull, "small")
          .when(col("meta.sample_rate") >= 30000, "hifi")
          .otherwise("lofi").as("size_class"))
}
