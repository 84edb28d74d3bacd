package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.{Validation, Weather}

/** B8/H10 validation semantics (gscap/utils.py:231-251, gps.py:137-153) and
  * the weather verify_request front door (gscap/weather.py:500-560).
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("validCoords: range bounds inclusive, (0,0) invalid, nulls invalid") {
    val rows = Seq(
      (1L, 40.0, -75.0, true),
      (2L, 90.0, 180.0, true),    // bounds are inclusive
      (3L, -90.0, -180.0, true),
      (4L, 90.0001, 0.0, false),  // lat out of range
      (5L, 0.0, -180.1, false),   // lon out of range
      (6L, 0.0, 0.0, false),      // null island (PlaceRequest.valid)
      (7L, 0.0, -75.0, true)      // only one zero coordinate is fine
    ).toDF("id", "lat", "lon", "expected")
    val r = rows.withColumn("v", Validation.validCoords(col("lat"), col("lon"))).collect()
    r.foreach(x => assert(x.getAs[Boolean]("v") === x.getAs[Boolean]("expected"), x.toString))
    val withNull = Seq((8L, Option.empty[Double], Option(1.0))).toDF("id", "lat", "lon")
      .withColumn("v", Validation.validCoords(col("lat"), col("lon")))
    assert(withNull.head.getAs[Boolean]("v") === false)
  }

  test("validate nulls coordinates of invalid rows and flags them") {
    val out = Validation.validate(
      Seq((1L, 40.0, -75.0), (2L, 91.0, -75.0)).toDF("id", "lat", "lon"))
      .orderBy("id").collect()
    assert(out(0).getAs[Boolean]("valid") && out(0).getAs[Double]("lat") === 40.0)
    assert(!out(1).getAs[Boolean]("valid") && out(1).isNullAt(out(1).fieldIndex("lat")))
  }

  test("zipWithin: -1 sentinel beyond the euclidean-degree bound (zip_from_dd)") {
    val df = Seq((10L, 1e-6), (11L, 1.0)).toDF("zip", "d2")
      .withColumn("z", Validation.zipWithin(col("zip"), col("d2"), 0.01))
    val r = df.orderBy("zip").collect()
    assert(r(0).getAs[Long]("z") === 10L)  // d=1e-3 < 0.01
    assert(r(1).getAs[Long]("z") === -1L)  // d=1 > 0.01
  }

  test("verifyRequests: zip centroid, unknown-zip drop, latlon kNN, noon anchor") {
    val d = Date.valueOf("2019-06-03")
    val reqs = Seq(
      (1L, Option(10001L), Option.empty[Double], Option.empty[Double], d), // zip form, hit
      (2L, Option(99999L), Option.empty[Double], Option.empty[Double], d), // zip form, miss → dropped
      (3L, Option.empty[Long], Option(40.001), Option(-75.0), d),          // latlon form
      (4L, Option.empty[Long], Option(95.0), Option(-75.0), d)             // out of range → dropped
    ).toDF("req_id", "zipcode", "lat", "lon", "date")
    val zips = Seq((10001L, 40.0, -75.0), (10002L, 41.0, -76.0)).toDF("zipcode", "d_lat", "d_lon")
    val out = Weather.verifyRequests(reqs, zips).orderBy("req_id").collect()
    assert(out.length === 2)
    val r1 = out(0)
    assert(r1.getAs[Long]("req_id") === 1L && r1.getAs[Double]("lat") === 40.0
      && r1.getAs[Double]("lon") === -75.0 && r1.getAs[Long]("zipcode") === 10001L)
    assert(r1.getAs[java.sql.Timestamp]("noon_ts").toString === "2019-06-03 12:00:00.0")
    val r3 = out(1)
    assert(r3.getAs[Long]("req_id") === 3L && r3.getAs[Long]("zipcode") === 10001L
      && r3.getAs[Double]("lat") === 40.001)
  }
}
