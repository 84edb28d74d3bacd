package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ingest.Pages
import graft.operators.Multimodal

/** Multimodal plumbing: schema, deterministic fake decode, thumbnail shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val gps = Seq(
    (1L, 10L, Timestamp.valueOf("2024-01-02 03:04:05"), 40.03, -75.01),
    (2L, 11L, Timestamp.valueOf("2024-01-02 03:05:05"), 40.04, -75.02))
    .toDF("user_id", "event_id", "ts", "lat", "lon")

  test("media table schema: opaque binary + typed metadata") {
    val media = Multimodal.mediaFromPages(Pages.pagesFromGps(gps))
    assert(media.schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      ("url", "string"), ("media_type", "string"), ("payload", "binary")))
    val types = media.select("media_type").as[String].collect()
    types.foreach(t => assert(Seq("image/png", "audio/wav").contains(t)))
  }

  test("real container-header decode: PNG IHDR and RIFF/WAVE fmt round-trip") {
    val df = Seq((1L, "png"), (2L, "wav"), (3L, "raw")).toDF("id", "kind")
    val body = encode(lit("payload-bytes"), "UTF-8")
    val payload = when(col("kind") === "png",
        Multimodal.pngPayload(lit(640), lit(480), body))
      .when(col("kind") === "wav",
        Multimodal.wavPayload(lit(44100), lit(2), body))
      .otherwise(body)
    val m = df.select(col("kind"), Multimodal.decodeMeta(payload).as("m"))
      .select("kind", "m.*").collect().map(r => r.getAs[String]("kind") -> r).toMap
    val png = m("png")
    assert(png.getAs[String]("sniffed_type") === "image/png")
    assert(png.getAs[Int]("width") === 640 && png.getAs[Int]("height") === 480)
    assert(png.getAs[Int]("bit_depth") === 8 && png.getAs[Int]("color_type") === 6)
    assert(png.getAs[Long]("n_bytes") === 33L + "payload-bytes".length)
    val wav = m("wav")
    assert(wav.getAs[String]("sniffed_type") === "audio/wav")
    assert(wav.getAs[Int]("channels") === 2 && wav.getAs[Int]("sample_rate") === 44100)
    assert(wav.getAs[Int]("bits_per_sample") === 16)
    assert(wav.getAs[Long]("n_bytes") === 36L + "payload-bytes".length)
    assert(wav.isNullAt(wav.fieldIndex("width")))
    val raw = m("raw")
    assert(raw.getAs[String]("sniffed_type") === "application/octet-stream")
    assert(raw.isNullAt(raw.fieldIndex("width")) && raw.isNullAt(raw.fieldIndex("channels")))
  }

  test("media pipeline: synthesized containers decode back via real header parse") {
    val media = Multimodal.mediaFromPages(Pages.pagesFromGps(gps))
    val f = Multimodal.mediaFeatures(media).orderBy("url").collect()
    assert(f.length === 2)
    f.foreach { r =>
      // sniffed type from actual magic bytes must agree with the label
      assert(r.getAs[String]("sniffed_type") === r.getAs[String]("media_type"))
      if (r.getAs[String]("media_type") == "image/png") {
        val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
        assert(w >= 64 && w < 1984 && h >= 64 && h < 1144)
        assert(r.getAs[Long]("pixels") === w.toLong * h)
        assert(Seq("large", "medium", "small").contains(r.getAs[String]("size_class")))
      } else {
        val sr = r.getAs[Int]("sample_rate")
        assert(sr >= 8000 && sr < 48000)
        assert(Seq(1, 2).contains(r.getAs[Int]("channels")))
        assert(Seq("hifi", "lofi").contains(r.getAs[String]("size_class")))
      }
      assert(r.getAs[Long]("thumb_bytes") <= 256L)
    }
    // determinism: same urls → same metadata on re-evaluation
    val again = Multimodal.mediaFeatures(media).orderBy("url").collect()
    assert(f.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
