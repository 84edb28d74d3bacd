package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** AS-OF join semantics: inclusive at-or-before, per-key, null when no
  * prior right row; plan stays a single-shuffle window (no range join).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin picks latest right row at-or-before, inclusive ties, null before first") {
    val left = Seq(
      (1L, ts(3), 10L), (1L, ts(5), 11L), (1L, ts(10), 12L), (2L, ts(7), 13L)
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, ts(5), 100.0), (1L, ts(9), 200.0), (2L, ts(8), 300.0)
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "t")
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(10L) === None)        // before first right row
    assert(out(11L) === Some(100.0)) // inclusive at equal ts
    assert(out(12L) === Some(200.0)) // latest prior, not first
    assert(out(13L) === None)        // key 2: right row is later
  }

  test("asofJoin carries multiple value columns and left payload columns") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "t", "payload")
    val right = Seq((1L, ts(4), 1.5, "x")).toDF("k", "t", "a", "b")
    val row = Temporal.asofJoin(left, right, Seq("k"), "t", "t").head
    assert(row.getAs[String]("payload") === "p")
    assert(row.getAs[Double]("asof_a") === 1.5)
    assert(row.getAs[String]("asof_b") === "x")
  }

  test("asofJoin matched row is atomic: NULL value columns survive, no field mixing") {
    val left = Seq((1L, ts(10), 1L), (1L, ts(20), 2L)).toDF("k", "t", "id")
    val right = Seq(
      (1L, ts(4), Some(1.5), Some("old")),
      (1L, ts(8), None: Option[Double], Some("new")) // later row, NULL in a
    ).toDF("k", "t", "a", "b")
    val rows = Temporal.asofJoin(left, right, Seq("k"), "t", "t")
      .orderBy("id").collect()
    // both left rows match the ts(8) right row ATOMICALLY: asof_a must be
    // the row-level NULL, never ts(4)'s 1.5 carried forward per-column
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("asof_a")))
      assert(r.getAs[String]("asof_b") === "new")
    }
  }

  test("intervalJoin: inclusive containment, cross-chunk spans, no duplicates") {
    val pts = Seq(
      (1L, ts(100), 1L), (1L, ts(7200), 2L), (1L, ts(7300), 3L), (1L, ts(50), 4L),
      (2L, ts(100), 5L)
    ).toDF("k", "t", "id")
    // interval spans 3 hour-chunks; boundaries inclusive
    val iv = Seq((1L, ts(100), ts(7200), "v1")).toDF("k", "s", "e", "tag")
    val out = Temporal.intervalJoin(pts, iv, Seq("k"), "t", "s", "e", chunkSeconds = 3600L)
      .select("id", "tag").as[(Long, String)].collect()
    assert(out.toSet === Set((1L, "v1"), (2L, "v1"))) // ids 1 (start bound) and 2 (end bound)
    assert(out.length === 2) // exactly once each despite the 3-chunk explode
  }

  test("intervalJoin: oversized intervals route to the bounded fallback, same results") {
    // one normal interval + one pathological 10-year span; with hour chunks
    // and maxChunksPerInterval=100 the big one would fabricate ~87k rows if
    // exploded — the guard routes it to the keys-only fallback instead.
    val tenYears = 10L * 365 * 86400
    val pts = Seq(
      (1L, ts(100), 1L), (1L, ts(7200), 2L), (1L, ts(tenYears / 2), 3L),
      (2L, ts(100), 4L), (2L, ts(tenYears + 1), 5L)
    ).toDF("k", "t", "id")
    val iv = Seq(
      (1L, ts(100), ts(7200), "small"),
      (1L, ts(0), ts(tenYears), "huge"),
      (2L, ts(0), ts(tenYears), "huge2")
    ).toDF("k", "s", "e", "tag")
    val guarded = Temporal.intervalJoin(pts, iv, Seq("k"), "t", "s", "e",
      chunkSeconds = 3600L, maxChunksPerInterval = 100L)
      .select("id", "tag").as[(Long, String)].collect().toSet
    // brute force on the same rows
    val brute = pts.join(iv, Seq("k")).where(col("t") >= col("s") && col("t") <= col("e"))
      .select("id", "tag").as[(Long, String)].collect().toSet
    assert(guarded === brute)
    // id 5 sits 1 s past huge2's end — excluded by the inclusive refine
    assert(guarded === Set((1L, "small"), (2L, "small"), (1L, "huge"),
      (2L, "huge"), (3L, "huge"), (4L, "huge2")))
    // the explode side never carries the oversized interval: its Generate
    // input is filtered to nChunks <= max
    val plan = Temporal.intervalJoin(pts, iv, Seq("k"), "t", "s", "e",
      chunkSeconds = 3600L, maxChunksPerInterval = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervalJoin plans as an equi join, never inequality-only/nested-loop") {
    val pts = Seq((1L, ts(100), 1L)).toDF("k", "t", "id")
    val iv = Seq((1L, ts(50), ts(150), "v")).toDF("k", "s", "e", "tag")
    val plan = Temporal.intervalJoin(pts, iv, Seq("k"), "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("asofJoin plans as one shuffle + window, never a range/nested-loop join") {
    val left = Seq((1L, ts(3), 10L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(2), 1.0)).toDF("k", "t", "v")
    val plan = Temporal.asofJoin(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // union + window — no join operator at all
    assert(plan.contains("Window"), plan)
  }
}
