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

  test("asofJoin plans as one shuffle + window, never a range/nested-loop join") {
    val left = Seq((1L, ts(3), 10L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(2), 1.0)).toDF("k", "t", "v")
    val plan = Temporal.asofJoin(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // union + window — no join operator at all
    assert(plan.contains("Window"), plan)
  }
}
