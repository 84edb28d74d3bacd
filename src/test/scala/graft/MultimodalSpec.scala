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

  test("PNG encode→decode round-trip is pixel-exact (all five filter types)") {
    import graft.functions.MediaImpl
    for ((w, h) <- Seq((1, 1), (3, 7), (8, 8), (17, 5), (64, 6))) {
      val expected = MediaImpl.rawImage(w, h, seed = w * 1000L + h)
      val dec = MediaImpl.pngDecode(MediaImpl.pngEncode(w, h, seed = w * 1000L + h))
      assert(dec != null, s"($w,$h)")
      assert(dec._1 === w && dec._2 === h)
      assert(dec._3.toSeq === expected.toSeq, s"($w,$h)") // h≥5 cycles filters 0..4
    }
    // non-PNG bytes are rejected, not crashed on
    assert(MediaImpl.pngDecode("not a png at all".getBytes) === null)
  }

  test("PNG unfilter is the spec algorithm: handcrafted Up-filtered image decodes to known pixels") {
    import graft.functions.MediaImpl
    import java.io.ByteArrayOutputStream
    import java.util.zip.{CRC32, Deflater}
    // 1×2 RGBA: row0 filter None = (10,20,30,40); row1 filter Up with
    // deltas (1,2,3,4) → reconstructed row1 = (11,22,33,44)
    val filtered = Array[Byte](0, 10, 20, 30, 40, 2, 1, 2, 3, 4)
    val d = new Deflater(); d.setInput(filtered); d.finish()
    val z = new ByteArrayOutputStream(); val buf = new Array[Byte](256)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    def be(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val crc = new CRC32(); crc.update(t.getBytes); crc.update(data)
      be(data.length) ++ t.getBytes ++ data ++ be(crc.getValue.toInt)
    }
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", be(1) ++ be(2) ++ Array[Byte](8, 6, 0, 0, 0)) ++
      chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    val dec = MediaImpl.pngDecode(png)
    assert(dec._1 === 1 && dec._2 === 2)
    assert(dec._3.toSeq === Seq[Byte](10, 20, 30, 40, 11, 22, 33, 44))
  }

  test("WAV PCM decode: handcrafted samples give exact amplitude stats") {
    import graft.functions.MediaImpl
    // minimal canonical wav with samples [100, -200, 300]
    val wav = MediaImpl.wavEncode(8000, 1, 3, seed = 0L)
    // overwrite the 3 samples with known LE values
    def le16(off: Int, v: Int): Unit = { wav(off) = (v & 0xff).toByte; wav(off + 1) = ((v >> 8) & 0xff).toByte }
    le16(44, 100); le16(46, -200 & 0xffff); le16(48, 300)
    val r = MediaImpl.wavStats(wav)
    assert(r.getBoolean(0) === true)
    assert(r.getLong(1) === 3L)     // n_samples
    assert(r.getLong(2) === 600L)   // sum_abs = 100+200+300
    assert(r.getInt(3) === 300)     // peak
    assert(r.getBinary(4).length === 16)
    // encode→decode agreement with the sample generator (LE byte round-trip)
    val n = 250
    val full = MediaImpl.wavEncode(44100, 2, n, seed = 7L)
    val expect = MediaImpl.rawSamples(n, 2, seed = 7L)
    val s = MediaImpl.wavStats(full)
    assert(s.getLong(1) === expect.length.toLong)
    assert(s.getLong(2) === expect.map(v => math.abs(v.toInt).toLong).sum)
    assert(s.getInt(3) === expect.map(v => math.abs(v.toInt)).max)
  }

  test("linear-content containers decode to the analytic sums (oracle pattern)") {
    import graft.functions.MediaImpl
    val (w, h, seed) = (11, 7, 300L) // sb = 44
    val r = MediaImpl.pngStats(MediaImpl.pngEncodeLin(w, h, seed))
    assert(r.getBoolean(0))
    def cs(f: (Int, Int) => Int): Long =
      (for { y <- 0 until h; x <- 0 until w } yield f(x, y).toLong).sum
    assert(r.getLong(3) === cs((x, y) => (44 + x + 2 * y) % 256))     // sum_r
    assert(r.getLong(4) === cs((x, y) => (44 + 3 * x + y) % 256))     // sum_g
    assert(r.getLong(5) === cs((x, y) => (44 + x + y) % 256))         // sum_b
    assert(r.getLong(6) === 255L * w * h)                             // sum_a
    val wv = MediaImpl.wavStats(MediaImpl.wavEncodeLin(44100, 2, 50, seed))
    val expect = (0 until 100).map(i => math.abs((44L * 97 + i * 37) % 65536 - 32768))
    assert(wv.getLong(1) === 100L)
    assert(wv.getLong(2) === expect.sum)
    assert(wv.getInt(3) === expect.max.toInt)
  }

  test("malformed containers are rejected, never looped or overread") {
    import graft.functions.MediaImpl
    // WAV whose first chunk declares length -8: the RIFF-walk advance would
    // be zero — an infinite loop without the len<0 guard
    val evil = MediaImpl.wavEncode(8000, 1, 2, seed = 0L)
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte; evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(MediaImpl.wavStats(evil).getBoolean(0) === false)
    // and len = -9 (negative advance)
    evil(16) = 0xf7.toByte
    assert(MediaImpl.wavStats(evil).getBoolean(0) === false)

    // PNG whose trailing IHDR declares len 4 < the 13 header fields: field
    // reads would run past the chunk/array without the len>=13 guard
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.write(Array[Byte](0, 0, 0, 4))            // len 4
    out.write("IHDR".getBytes("US-ASCII"))
    out.write(Array[Byte](1, 2, 3, 4))            // 4 data bytes only
    out.write(Array[Byte](0, 0, 0, 0))            // crc
    assert(MediaImpl.pngDecode(out.toByteArray) === null)
    assert(MediaImpl.pngStats(out.toByteArray).getBoolean(0) === false)
  }

  test("media pipeline: synthesized containers decode back via real content parse") {
    val media = Multimodal.mediaFromPages(Pages.pagesFromGps(gps))
    val f = Multimodal.mediaFeatures(media).orderBy("url").collect()
    assert(f.length === 2)
    f.foreach { r =>
      // sniffed type from actual magic bytes must agree with the label
      assert(r.getAs[String]("sniffed_type") === r.getAs[String]("media_type"))
      if (r.getAs[String]("media_type") == "image/png") {
        val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
        assert(w >= 8 && w < 72 && h >= 8 && h < 72)
        assert(r.getAs[Long]("pixels") === w.toLong * h)
        // decoded-pixel features: 4×4 RGBA pooled thumb, plausible mean
        assert(r.getAs[Array[Byte]]("thumb").length === 64)
        val lvl = r.getAs[Double]("mean_level")
        assert(lvl > 0 && lvl < 255, s"mean_level=$lvl")
        assert(r.isNullAt(r.fieldIndex("mean_amplitude")))
      } else {
        val sr = r.getAs[Int]("sample_rate")
        assert(Seq(8000, 22050, 44100).contains(sr))
        assert(Seq(1, 2).contains(r.getAs[Int]("channels")))
        // decoded-sample features: 16-bin waveform, plausible amplitude
        assert(r.getAs[Array[Byte]]("waveform").length === 16)
        assert(r.getAs[Double]("mean_amplitude") > 0)
        assert(r.getAs[Int]("peak") > 0 && r.getAs[Int]("peak") <= 32768)
        assert(r.isNullAt(r.fieldIndex("mean_level")))
      }
    }
    // determinism: same urls → same features on re-evaluation (binary
    // columns compared by content, not array identity)
    def canon(r: org.apache.spark.sql.Row): String =
      r.toSeq.map {
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case v => String.valueOf(v)
      }.mkString("|")
    val again = Multimodal.mediaFeatures(media).orderBy("url").collect()
    assert(f.map(canon).toSeq === again.map(canon).toSeq)
  }
}
