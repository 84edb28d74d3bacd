package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Motion

/** Velocity/binning parity with the reference motion tests.
  * References: tests/some_gps.csv (7-row fixture), tests/test_gps.py:475-546
  * (displacement 11.1 / Δt 60 / velocity 0.185 and one case per bin),
  * gscap/gps.py:857-937.
  */
class MotionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** tests/some_gps.csv rows (2016-08-13). */
  private lazy val someGps: DataFrame = Seq(
    ("u", 1L, ts("2016-08-13 08:13:00"), 40.0, -45.0),
    ("u", 2L, ts("2016-08-13 08:14:00"), 40.0001, -45.0),
    ("u", 3L, ts("2016-08-13 08:24:00"), 40.0002, -45.0),
    ("u", 4L, ts("2016-08-13 09:24:00"), 40.0003, -45.0),
    ("u", 5L, ts("2016-08-13 09:25:00"), 40.01, -45.0),
    ("u", 6L, ts("2016-08-13 09:35:00"), 40.02, -45.0),
    ("u", 7L, ts("2016-08-13 10:35:00"), 40.03, -45.0)
  ).toDF("user_id", "event_id", "ts", "lat", "lon")

  test("process_velocities row 2: 11.1 m / 60 s / 0.185 m/s stationary (test_gps.py:475-486)") {
    val r = Motion.processVelocities(someGps).orderBy("ts").collect()
    assert(r(0).getAs[String]("binning") === "null")
    assert(r(0).getAs[Any]("displacement") === null)
    val row1 = r(1)
    assert(row1.getAs[String]("binning") === "stationary")
    assert(row1.getAs[Double]("displacement") === 11.1)
    assert(row1.getAs[Long]("time_delta") === 60L)
    assert(row1.getAs[Double]("velocity") === 0.185)
  }

  private def binOf(lat1: Double, lon1: Double, lat2: Double, lon2: Double, seconds: Long): String = {
    val df = Seq(
      ("u", 1L, ts("2018-01-01 00:00:00"), lat1, lon1),
      ("u", 2L, new Timestamp(ts("2018-01-01 00:00:00").getTime + seconds * 1000), lat2, lon2)
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    Motion.processVelocities(df).orderBy("ts").collect()(1).getAs[String]("binning")
  }

  // tests/test_gps.py:488-546, Seattle coordinate pairs
  test("discrete bins: powered_vehicle over 1 min")   { assert(binOf(47.679853, -122.325744, 47.673600, -122.364783, 60) === "powered_vehicle") }
  test("discrete bins: walking over 1 h")             { assert(binOf(47.679853, -122.325744, 47.673600, -122.364783, 3600) === "walking") }
  test("discrete bins: stationary when same point")   { assert(binOf(47.679853, -122.325744, 47.679853, -122.325744, 3600) === "stationary") }
  test("discrete bins: active over 30 min")           { assert(binOf(47.679853, -122.325744, 47.673600, -122.364783, 1800) === "active") }
  test("discrete bins: high_speed over 2 h")          { assert(binOf(47.679853, -122.325744, 40.772849, -111.838413, 7200) === "high_speed_transportation") }
  test("discrete bins: anomaly over 1 min")           { assert(binOf(47.679853, -122.325744, 40.772849, -111.838413, 60) === "anomaly") }

  test("time_delta uses timedelta.seconds semantics — mod 86400 (gps.py:886-889)") {
    // 25h gap: .seconds == 3600, and 3600 < 18h so row is NOT nulled
    val df = Seq(
      ("u", 1L, ts("2018-01-01 00:00:00"), 47.679853, -122.325744),
      ("u", 2L, ts("2018-01-02 01:00:00"), 47.679853, -122.325744)
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    val r = Motion.processVelocities(df).orderBy("ts").collect()(1)
    assert(r.getAs[Long]("time_delta") === 3600L)
    assert(r.getAs[String]("binning") === "stationary")
  }

  test("18h guard nulls the row (gps.py:820-823)") {
    // 19h gap: .seconds = 68400 > 64800 → nulled
    val df = Seq(
      ("u", 1L, ts("2018-01-01 00:00:00"), 47.679853, -122.325744),
      ("u", 2L, ts("2018-01-01 19:00:00"), 47.673600, -122.364783)
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    val r = Motion.processVelocities(df).orderBy("ts").collect()(1)
    assert(r.getAs[String]("binning") === "null")
    assert(r.getAs[Any]("velocity") === null)
  }

  test("minute resample means lat/lon per minute (gps.py:1757-1780)") {
    val df = Seq(
      ("u", 1L, ts("2016-08-13 08:13:10"), 40.0, -45.0),
      ("u", 2L, ts("2016-08-13 08:13:50"), 40.0002, -45.0002),
      ("u", 3L, ts("2016-08-13 08:14:10"), 41.0, -46.0)
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    val r = Motion.resampleMinutes(df).orderBy("ts").collect()
    assert(r.length === 2)
    assert(math.abs(r(0).getAs[Double]("lat") - 40.0001) < 1e-12)
    assert(r(0).getAs[Timestamp]("ts") === ts("2016-08-13 08:13:00"))
    assert(r(0).getAs[Long]("n_points") === 2L)
  }

  test("impute_between: endpoint-exclusive fills, linear interpolation (gps.py:1611-1650)") {
    // 40 min gap, stationary (same point-ish), step 10 min → fills at +10,+20,+30
    val df = Seq(
      ("u", 1L, ts("2019-01-01 00:00:00"), 40.0, -75.0),
      ("u", 2L, ts("2019-01-01 00:40:00"), 40.0003, -75.0003)
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    val r = Motion.imputeStationary(df, stepSec = 600L).orderBy("ts").collect()
    assert(r.length === 5)
    val fills = r.filter(_.getAs[Long]("event_id") == -1L)
    assert(fills.length === 3)
    assert(fills.map(_.getAs[Timestamp]("ts").toString).toSeq ===
      Seq("2019-01-01 00:10:00.0", "2019-01-01 00:20:00.0", "2019-01-01 00:30:00.0"))
    // linspace over kept stamps: fractions 0, 1/2, 1 of the segment
    val lats = fills.map(_.getAs[Double]("lat"))
    assert(math.abs(lats(0) - 40.0) < 1e-12)
    assert(math.abs(lats(1) - 40.00015) < 1e-12)
    assert(math.abs(lats(2) - 40.0003) < 1e-12)
  }

  test("first-of-day rows get seconds-since-midnight time_delta (W7, gps.py:1716-1731)") {
    val df = Seq(
      ("u", 1L, ts("2019-01-01 23:00:00"), 40.0, -75.0),
      ("u", 2L, ts("2019-01-02 06:30:00"), 40.0, -75.0),
      ("u", 3L, ts("2019-01-02 07:00:00"), 40.0, -75.0)
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    val r = Motion.firstOfDayTimeDelta(Motion.processVelocities(df)).orderBy("ts").collect()
    assert(r(0).getAs[Any]("time_delta") === null)          // first row: binning 'null' stays null
    assert(r(1).getAs[Long]("time_delta") === 6L * 3600 + 1800) // 06:30 → 23400 s since midnight
    assert(r(2).getAs[Long]("time_delta") === 1800L)        // untouched lag delta
  }

  test("SQL-registered extract_text matches the Column API") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT extract_text(encode('<p>a &amp; b</p>', 'UTF-8')) AS t").head.getString(0)
    assert(out === "a & b")
  }

  test("impute skips moving or too-distant pairs") {
    val df = Seq(
      ("u", 1L, ts("2019-01-01 00:00:00"), 40.0, -75.0),
      ("u", 2L, ts("2019-01-01 00:40:00"), 40.01, -75.01) // ~1.4 km apart > 75 m
    ).toDF("user_id", "event_id", "ts", "lat", "lon")
    assert(Motion.imputeStationary(df).count() === 2)
  }
}
