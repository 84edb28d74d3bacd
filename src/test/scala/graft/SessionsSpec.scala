package graft

import java.sql.Timestamp
import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Sessions

/** Sessionization parity: pos counter (gps.py:1280-1292), collapse
  * (gps.py:1294-1305), midnight merge (gps.py:1307-1321), duration/midpoint
  * rounding (gps.py:1350-1351).
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def pts(rows: (String, Long, String, String)*): DataFrame =
    rows.map { case (u, id, t, cid) => (u, id, ts(t), Date.valueOf(t.take(10)), cid, "stationary", 40.0, -75.0) }
      .toDF("user_id", "event_id", "ts", "date", "cid", "binning", "lat", "lon")

  test("pos increments on cid change within a day (gps.py:1280-1292)") {
    val v = Sessions.visits(pts(
      ("u", 1, "2019-01-01 08:00:00", "a"),
      ("u", 2, "2019-01-01 08:10:00", "a"),
      ("u", 3, "2019-01-01 09:00:00", "b"),
      ("u", 4, "2019-01-01 10:00:00", "a"))).orderBy("pos").collect()
    assert(v.map(r => (r.getAs[Long]("pos"), r.getAs[String]("cid"))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "a")))
    assert(v(0).getAs[Timestamp]("time_in") === ts("2019-01-01 08:00:00"))
    assert(v(0).getAs[Timestamp]("time_out") === ts("2019-01-01 08:10:00"))
    assert(v(0).getAs[Long]("n_points") === 2L)
    assert(v(0).getAs[Long]("duration") === 600L)
    assert(v(0).getAs[Timestamp]("midpoint") === ts("2019-01-01 08:05:00"))
  }

  test("midnight merge stretches both sides (gps.py:1307-1321)") {
    val v = Sessions.visits(pts(
      ("u", 1, "2019-01-01 22:00:00", "home"),
      ("u", 2, "2019-01-01 23:30:00", "home"),
      ("u", 3, "2019-01-02 00:30:00", "home"),
      ("u", 4, "2019-01-02 01:00:00", "home"))).orderBy("date").collect()
    assert(v.length === 2)
    assert(v(0).getAs[Timestamp]("time_out") === ts("2019-01-01 23:59:59"))
    assert(v(1).getAs[Timestamp]("time_in") === ts("2019-01-02 00:00:00"))
  }

  test("no merge across a cid change at midnight") {
    val v = Sessions.visits(pts(
      ("u", 1, "2019-01-01 23:00:00", "home"),
      ("u", 2, "2019-01-02 00:30:00", "work"))).orderBy("date").collect()
    assert(v(0).getAs[Timestamp]("time_out") === ts("2019-01-01 23:00:00"))
    assert(v(1).getAs[Timestamp]("time_in") === ts("2019-01-02 00:30:00"))
  }

  test("non-stationary rows are excluded (gps.py:1328-1330)") {
    val df = Seq(
      ("u", 1L, ts("2019-01-01 08:00:00"), Date.valueOf("2019-01-01"), "a", "walking", 40.0, -75.0),
      ("u", 2L, ts("2019-01-01 08:10:00"), Date.valueOf("2019-01-01"), "a", "stationary", 40.0, -75.0)
    ).toDF("user_id", "event_id", "ts", "date", "cid", "binning", "lat", "lon")
    val v = Sessions.visits(df).collect()
    assert(v.length === 1)
    assert(v(0).getAs[Long]("n_points") === 1L)
  }

  test("cluster metrics: durations in hours 3dp, closed-form inter-visit interval (gps.py:656-793)") {
    // non-adjacent days so the midnight merge does not rewrite boundaries
    val v = Sessions.visits(pts(
      ("u", 1, "2019-01-01 08:00:00", "a"),
      ("u", 2, "2019-01-01 09:00:00", "a"),
      ("u", 3, "2019-01-03 08:00:00", "a"),
      ("u", 4, "2019-01-03 10:00:00", "a")))
    val m = Sessions.clusterMetrics(v).collect()
    assert(m.length === 1)
    val r = m(0)
    assert(r.getAs[Long]("times_entered") === 2L)
    assert(r.getAs[Double]("total_duration") === 3.0)   // 1h + 2h
    assert(r.getAs[Double]("mean_duration") === 1.5)
    assert(r.getAs[Double]("max_duration") === 2.0)
    // midpoints 01-01 08:30 and 01-03 09:00 → 48.5 h apart
    assert(r.getAs[Double]("mean_ti_between_visits") === 48.5)
  }
}
