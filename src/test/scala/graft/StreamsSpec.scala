package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Streaming façade checks via MemoryStream. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming minute resample matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double, Double)]
    val df = input.toDF().toDF("user_id", "ts", "lat", "lon")
    val q = Streams.resampleMinutes(df)
      .writeStream.format("memory").queryName("resampled").outputMode("append").start()
    input.addData(
      (1L, ts("2024-01-01 08:13:10"), 40.0, -75.0),
      (1L, ts("2024-01-01 08:13:50"), 40.0002, -75.0002),
      (1L, ts("2024-01-01 08:30:00"), 41.0, -76.0),
      (1L, ts("2024-01-01 09:00:00"), 42.0, -77.0)) // advances watermark past 08:13
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 09:30:00"), 42.0, -77.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM resampled WHERE ts = '2024-01-01 08:13:00'").collect()
    q.stop()
    assert(rows.length === 1)
    assert(math.abs(rows(0).getAs[Double]("lat") - 40.0001) < 1e-12)
    assert(rows(0).getAs[Long]("n_points") === 2L)
  }

  test("stateless dataset-assembly projections run unchanged on a stream") {
    // splitAssign / sampleStratified are pure per-row functions of the id,
    // so the SAME operator works in a readStream pipeline with no watermark
    // or state — the property a unified batch/stream assembly needs: a doc
    // gets the same split whether it arrives in a backfill or live
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Docs
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "lang")
    val q1 = Docs.sampleStratified(df)
      .writeStream.format("memory").queryName("stream_sample").outputMode("append").start()
    val q2 = Docs.splitAssign(df.select("doc_id"))
      .writeStream.format("memory").queryName("stream_split").outputMode("append").start()
    input.addData((1L to 50L).map(i => (i, if (i % 2 == 0) "en" else "zh")): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    val sampled = spark.sql("SELECT doc_id, lang, bucket FROM stream_sample")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val splits = spark.sql("SELECT doc_id, split FROM stream_split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    q1.stop(); q2.stop()
    val data = (1L to 50L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
    val batchSampled = Docs.sampleStratified(data.toDF("doc_id", "lang"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("bucket"))).toSet
    val batchSplits = Docs.splitAssign(data.toDF("doc_id", "lang").select("doc_id"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toSet
    assert(sampled === batchSampled, "stream and batch keep the same docs with the same buckets")
    assert(splits === batchSplits, "stream and batch assign identical splits")
  }

  test("streaming dedup drops in-horizon repeats, keeps distinct texts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.dedupDocs(df)
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    input.addData(
      (1L, ts("2024-01-01 08:00:00"), "alpha beta"),
      (2L, ts("2024-01-01 08:00:30"), "alpha beta"),  // dup within horizon
      (3L, ts("2024-01-01 08:01:00"), "gamma delta"))
    q.processAllAvailable()
    input.addData((4L, ts("2024-01-01 08:02:00"), "alpha beta")) // still duplicate state
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM deduped ORDER BY doc_id").collect().map(_.getLong(0))
    q.stop()
    assert(kept.toSeq === Seq(1L, 3L)) // one row per distinct digest
  }

  test("late data beyond the watermark is dropped, inside it is aggregated") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double, Double)]
    val df = input.toDF().toDF("user_id", "ts", "lat", "lon")
    val q = Streams.resampleMinutes(df, watermark = "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    input.addData((1L, ts("2024-01-01 08:00:10"), 40.0, -75.0))
    q.processAllAvailable()
    // advance event time: watermark → 08:50
    input.addData((1L, ts("2024-01-01 09:00:00"), 41.0, -76.0))
    q.processAllAvailable()
    // 08:00 is far behind the 08:50 watermark → must NOT reopen the window;
    // 08:55 is within it → aggregated
    input.addData(
      (1L, ts("2024-01-01 08:00:20"), 99.0, 99.0),
      (1L, ts("2024-01-01 08:55:00"), 42.0, -77.0))
    q.processAllAvailable()
    // close remaining windows
    input.addData((1L, ts("2024-01-01 10:00:00"), 43.0, -78.0))
    q.processAllAvailable()
    val w800 = spark.sql("SELECT * FROM late WHERE ts = '2024-01-01 08:00:00'").collect()
    val w855 = spark.sql("SELECT * FROM late WHERE ts = '2024-01-01 08:55:00'").collect()
    q.stop()
    assert(w800.length === 1 && w800(0).getAs[Long]("n_points") === 1L) // late row dropped
    assert(w800(0).getAs[Double]("lat") === 40.0)
    assert(w855.length === 1 && w855(0).getAs[Long]("n_points") === 1L) // in-watermark row kept
  }

  test("streaming near-dup drops a band-colliding doc inside the watermark, keeps it outside") {
    implicit val sqlCtx = spark.sqlContext
    // fixture: near-identical texts that share ≥1 signature band — pre-asserted
    // against the BATCH pipeline so the fixture is self-validating and the
    // stream filter is pinned to the same minhash/banding mechanics
    val base = "the quick brown fox jumps over the lazy dog while the rain falls on the plain in spain"
    val near = base + " today" // shares 16 of 17 3-gram shingles
    val sigs = operators.Docs.minHashSignature(
      Seq((1L, base), (2L, near)).toDF("doc_id", "text"))
    assert(operators.Docs.minHashCandidates(sigs).count() === 1L,
      "fixture texts must band-collide in the batch pipeline")

    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.nearDedupDocs(df)
      .writeStream.format("memory").queryName("neardedup").outputMode("append").start()
    input.addData((1L, ts("2024-01-01 08:00:00"), base))
    q.processAllAvailable()
    // near-dup INSIDE the horizon: ≥1 of its band buckets is already held
    // by doc 1 → dropped
    input.addData((2L, ts("2024-01-01 08:05:00"), near))
    q.processAllAvailable()
    // advance the watermark to 09:20 → doc 1/2 bucket state (expiry ≤08:15) evicts
    input.addData((3L, ts("2024-01-01 09:30:00"),
      "completely different content about spark catalyst optimizer internals and codegen"))
    q.processAllAvailable()
    // the SAME near-dup text beyond the horizon: buckets evicted → kept
    input.addData((4L, ts("2024-01-01 09:25:00"), near))
    q.processAllAvailable()
    // close all windows
    input.addData((5L, ts("2024-01-01 11:00:00"),
      "closing sentinel document to advance the watermark far beyond everything"))
    q.processAllAvailable()
    val keptRows = spark.sql("SELECT doc_id, text FROM neardedup ORDER BY doc_id").collect()
    val kept = keptRows.map(_.getLong(0))
    q.stop()
    assert(kept.contains(1L), "first doc kept")
    assert(!kept.contains(2L), "in-horizon near-dup dropped")
    assert(kept.contains(4L), "beyond-horizon near-dup re-emitted")
    // the text payload rides only the band-0 row — kept docs must still carry it
    assert(keptRows.forall(_.getString(1) != null), "kept docs retain their text")
    assert(keptRows.find(_.getLong(0) == 4L).get.getString(1) === near)
  }

  test("streaming and batch near-dup agree on in-horizon kept docs (doc_id arrival order)") {
    implicit val sqlCtx = spark.sqlContext
    // Two near-dup groups (members collide DIRECTLY with the group min —
    // the regime where stream arrival-first == batch min-doc_id survivor
    // selection, per the Scaladoc contract) plus two unique docs.
    val g1 = "the quick brown fox jumps over the lazy dog while the rain falls on the plain in spain"
    val g2 = "spark catalyst rewrites logical plans into physical operators with whole stage codegen enabled everywhere"
    val corpus = Seq(
      1L -> g1, 2L -> (g1 + " today"), 3L -> (g1 + " tonight"),
      4L -> g2, 5L -> (g2 + " quickly"),
      6L -> "totally unrelated text about weather stations and gps traces in the wild",
      7L -> "another unique document mentioning neither foxes nor optimizers at all")
    val docs = corpus.toDF("doc_id", "text")

    // batch: xxhash64 signatures → band candidates → CC → min-doc_id reps
    val cands = operators.Docs.minHashCandidates(operators.Docs.minHashSignature(docs))
    // fixture sanity: every non-min member collides with an EARLIER doc —
    // rules out the transitive-via-later-doc case where survivors differ
    val pairs = cands.as[(Long, Long)].collect().toSet
    assert(Seq(2L, 3L, 5L).forall(b => pairs.exists { case (a, bb) => bb == b && a < b }),
      s"fixture must band-collide each member with an earlier doc; got $pairs")
    val clusters = operators.Docs.nearDupClusters(cands)
    val batchDropped = clusters.where($"doc_id" =!= $"rep")
      .select("doc_id").as[Long].collect().toSet
    val batchKept = corpus.map(_._1).toSet -- batchDropped

    // stream: same corpus, arrival in doc_id order, all inside one horizon
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.nearDedupDocs(df)
      .writeStream.format("memory").queryName("agree").outputMode("append").start()
    corpus.zipWithIndex.foreach { case ((id, text), i) =>
      input.addData((id, ts(s"2024-01-01 08:0$i:00"), text))
      q.processAllAvailable()
    }
    input.addData((99L, ts("2024-01-01 11:00:00"),
      "sentinel closing document far beyond the watermark horizon"))
    q.processAllAvailable()
    val streamKept = spark.sql("SELECT doc_id FROM agree").as[Long].collect().toSet - 99L
    q.stop()
    assert(streamKept === batchKept,
      s"stream kept $streamKept, batch kept $batchKept")
  }

  test("streaming sessionization closes visits on cid change") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.StreamPoint]
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("visits").outputMode("append").start()
    input.addData(
      Streams.StreamPoint(1L, ts("2024-01-01 08:00:00"), 40.0, -75.0, "home"),
      Streams.StreamPoint(1L, ts("2024-01-01 08:10:00"), 40.0, -75.0, "home"),
      Streams.StreamPoint(1L, ts("2024-01-01 09:00:00"), 40.1, -75.1, "work"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM visits").collect()
    q.stop()
    assert(rows.length === 1) // home visit closed by the work point
    assert(rows(0).getAs[String]("cid") === "home")
    assert(rows(0).getAs[Long]("n_points") === 2L)
    assert(rows(0).getAs[Timestamp]("time_out") === ts("2024-01-01 08:10:00"))
  }
}
