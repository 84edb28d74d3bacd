package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Motion

/** Golden parity against the reference implementation ITSELF: the fixture
  * `golden_velocities.csv` was produced by executing the reference's
  * process_velocities (gscap/gps.py:799-854) over its own 4,906-row Seattle
  * trace tests/some_data.csv (generator: tools/gen_golden.py, stubbing only
  * absent transitive deps). Every row's bin, displacement, Δt, and velocity
  * must match exactly — including sub-second timedelta.seconds flooring.
  */
class GoldenSpec extends SparkSpec {

  private def res(name: String) = getClass.getResource(s"/$name").toString

  test("process_velocities matches the reference on some_data.csv, all 4906 rows") {
    val schema = StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("ts", TimestampType)))
    val raw = spark.read.option("header", "true").schema(schema)
      .csv(res("some_data.csv"))
      .coalesce(1)
      .withColumn("event_id", monotonically_increasing_id()) // file order = pandas stable-sort tiebreak
      .withColumn("user_id", lit(1L))

    val ours = Motion.processVelocities(raw)
      .select("ts", "lat", "lon", "binning", "displacement", "time_delta", "velocity")

    val gschema = StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("ts", TimestampType), StructField("binning", StringType),
      StructField("displacement", DoubleType), StructField("time_delta", DoubleType),
      StructField("velocity", DoubleType)))
    val golden = spark.read.option("header", "true").schema(gschema)
      .csv(res("golden_velocities.csv"))

    val a = ours.orderBy("ts", "lat", "lon").collect()
    val b = golden.orderBy("ts", "lat", "lon").collect()
    assert(a.length === 4906)
    assert(a.length === b.length)
    var mismatches = 0
    a.zip(b).foreach { case (x, y) =>
      val okBin = x.getAs[String]("binning") == y.getAs[String]("binning")
      def d(c: String): Option[Double] = Option(x.getAs[Any](c)).map(_.toString.toDouble)
      def g(c: String): Option[Double] = Option(y.getAs[Any](c)).map(_.toString.toDouble)
      val okDisp = (d("displacement"), g("displacement")) match {
        case (Some(u), Some(v)) => math.abs(u - v) < 1e-9
        case (None, None) => true; case _ => false
      }
      val okDt = (d("time_delta"), g("time_delta")) match {
        case (Some(u), Some(v)) => u == v
        case (None, None) => true; case _ => false
      }
      val okVel = (d("velocity"), g("velocity")) match {
        case (Some(u), Some(v)) => math.abs(u - v) < 1e-9
        case (None, None) => true; case _ => false
      }
      if (!(okBin && okDisp && okDt && okVel)) {
        mismatches += 1
        if (mismatches <= 3) info(s"ours=$x golden=$y")
      }
    }
    assert(mismatches === 0, s"$mismatches of ${a.length} rows diverge from the reference output")
  }
}
