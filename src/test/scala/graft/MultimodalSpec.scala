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
    types.foreach(t => assert(Seq("image/png", "image/jpeg", "audio/wav", "video/mp4").contains(t)))
  }

  test("fake decode recovers header metadata deterministically") {
    val media = Multimodal.mediaFromPages(Pages.pagesFromGps(gps))
    val f = Multimodal.mediaFeatures(media).orderBy("url").collect()
    assert(f.length === 2)
    f.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 64 && w < 1984 && h >= 64 && h < 1144)
      assert(r.getAs[Long]("pixels") === w.toLong * h)
      assert(r.getAs[Long]("thumb_bytes") <= 256L)
      assert(Seq("large", "medium", "small").contains(r.getAs[String]("size_class")))
    }
    // determinism: same urls → same metadata on re-evaluation
    val again = Multimodal.mediaFeatures(media).orderBy("url").collect()
    assert(f.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
