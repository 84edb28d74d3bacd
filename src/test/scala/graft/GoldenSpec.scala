package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Motion, Sessions}

/** Golden parity against the reference implementation ITSELF: the fixture
  * `golden_velocities.csv` was produced by executing the reference's
  * process_velocities (gscap/gps.py:799-854) over its own 4,906-row Seattle
  * trace tests/some_data.csv (generator: tools/gen_golden.py, stubbing only
  * absent transitive deps). Every row's bin, displacement, Δt, and velocity
  * must match exactly — including sub-second timedelta.seconds flooring.
  */
class GoldenSpec extends SparkSpec {

  private def res(name: String) = getClass.getResource(s"/$name").toString

  private def someData = {
    val schema = StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("ts", TimestampType)))
    spark.read.option("header", "true").schema(schema).csv(res("some_data.csv"))
      .coalesce(1)
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L))
  }

  private def approx(a: Option[Double], b: Option[Double], tol: Double): Boolean = (a, b) match {
    case (Some(x), Some(y)) => (x.isNaN && y.isNaN) || math.abs(x - y) <= tol
    case (None, None) => true
    case (Some(x), None) => x.isNaN
    case (None, Some(y)) => y.isNaN
    case _ => false
  }
  private def optD(r: org.apache.spark.sql.Row, c: String): Option[Double] =
    Option(r.getAs[Any](c)).map(_.toString.toDouble)

  test("resample_gps_intervals matches the reference on some_data.csv") {
    val ours = Motion.resampleMinutes(someData).orderBy("ts").collect()
    val gschema = StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("ts", TimestampType)))
    val golden = spark.read.option("header", "true").schema(gschema)
      .csv(res("golden_resample.csv")).orderBy("ts").collect()
    assert(ours.length === golden.length)
    ours.zip(golden).foreach { case (a, b) =>
      assert(a.getAs[java.sql.Timestamp]("ts") === b.getAs[java.sql.Timestamp]("ts"))
      assert(approx(optD(a, "lat"), optD(b, "lat"), 1e-9))
      assert(approx(optD(a, "lon"), optD(b, "lon"), 1e-9))
    }
  }

  test("impute_stationary_coordinates pipeline matches the reference on some_gps.csv") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("lat", DoubleType),
      StructField("lon", DoubleType)))
    val sg = spark.read.option("header", "true")
      .option("timestampFormat", "M/d/yyyy H:mm").schema(schema)
      .csv(res("some_gps_fixture.csv"))
    val base = sg.coalesce(1)
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L))
    val ours = Motion.firstOfDayTimeDelta(
      Motion.processVelocities(Motion.imputeStationary(base, stepSec = 600L)))
      .orderBy("ts")
      .select("ts", "lat", "lon", "binning", "displacement", "time_delta", "velocity")
      .collect()
    val gschema = StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("ts", TimestampType), StructField("binning", StringType),
      StructField("displacement", DoubleType), StructField("time_delta", DoubleType),
      StructField("velocity", DoubleType)))
    val golden = spark.read.option("header", "true").schema(gschema)
      .csv(res("golden_impute.csv")).orderBy("ts").collect()
    assert(ours.length === golden.length)
    ours.zip(golden).foreach { case (a, b) =>
      assert(a.getAs[java.sql.Timestamp]("ts") === b.getAs[java.sql.Timestamp]("ts"))
      assert(approx(optD(a, "lat"), optD(b, "lat"), 1e-9), s"$a vs $b")
      assert(a.getAs[String]("binning") === b.getAs[String]("binning"))
      assert(approx(optD(a, "displacement"), optD(b, "displacement"), 1e-9))
      assert(approx(optD(a, "time_delta"), optD(b, "time_delta"), 0.0))
      assert(approx(optD(a, "velocity"), optD(b, "velocity"), 1e-9))
    }
  }

  test("get_cluster_times matches the reference (847 visits over some_data)") {
    val enriched = Motion.processVelocities(someData)
      .withColumn("date", col("ts").cast("date"))
      .withColumn("cid",
        concat(lit("x"), pmod(floor(col("lat") * 1e5).cast("long"), lit(3L)).cast("string")))
    val ours = Sessions.visits(enriched)
      .orderBy("date", "pos", "cid")
      .select("cid", "date", "time_in", "midpoint", "time_out", "duration", "pos", "n_points", "lat", "lon")
      .collect()
    val gschema = StructType(Seq(
      StructField("cid", StringType), StructField("date", DateType),
      StructField("time_in", TimestampType), StructField("midpoint", TimestampType),
      StructField("time_out", TimestampType), StructField("duration_s", DoubleType),
      StructField("pos", LongType), StructField("n_points", LongType),
      StructField("lat", DoubleType), StructField("lon", DoubleType)))
    val golden = spark.read.option("header", "true").schema(gschema)
      .csv(res("golden_entries.csv")).orderBy("date", "pos", "cid").collect()
    assert(ours.length === golden.length)
    var bad = 0
    ours.zip(golden).foreach { case (a, b) =>
      val ok = a.getAs[String]("cid") == b.getAs[String]("cid") &&
        a.getAs[java.sql.Timestamp]("time_in") == b.getAs[java.sql.Timestamp]("time_in") &&
        a.getAs[java.sql.Timestamp]("time_out") == b.getAs[java.sql.Timestamp]("time_out") &&
        a.getAs[java.sql.Timestamp]("midpoint") == b.getAs[java.sql.Timestamp]("midpoint") &&
        a.getAs[Long]("duration").toDouble == b.getAs[Double]("duration_s") &&
        a.getAs[Long]("pos") == b.getAs[Long]("pos") &&
        a.getAs[Long]("n_points") == b.getAs[Long]("n_points") &&
        approx(optD(a, "lat"), optD(b, "lat"), 1e-12) &&
        approx(optD(a, "lon"), optD(b, "lon"), 1e-12)
      if (!ok) { bad += 1; if (bad <= 3) info(s"ours=$a golden=$b") }
    }
    assert(bad === 0, s"$bad of ${ours.length} visits diverge")
  }

  test("cluster_metrics matches the reference over some_entries/some_clusters") {
    val ent = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(res("some_entries.csv"))
      .withColumn("user_id", lit(1L))
      .withColumn("duration",
        regexp_extract(col("duration"), "(\\d+) days (\\d+):(\\d+):(\\d+)", 1).cast("long") * 86400L +
        regexp_extract(col("duration"), "(\\d+) days (\\d+):(\\d+):(\\d+)", 2).cast("long") * 3600L +
        regexp_extract(col("duration"), "(\\d+) days (\\d+):(\\d+):(\\d+)", 3).cast("long") * 60L +
        regexp_extract(col("duration"), "(\\d+) days (\\d+):(\\d+):(\\d+)", 4).cast("long"))
      .withColumn("midpoint", coalesce(
        try_to_timestamp(col("midpoint"), lit("M/d/yyyy H:mm")),
        try_to_timestamp(col("midpoint"), lit("M/d/yyyy"))))
    val ours = Sessions.clusterMetrics(ent).collect()
      .map(r => r.getAs[String]("cid") -> r).toMap
    val golden = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(res("golden_cluster_metrics.csv")).collect()
      .map(r => r.getAs[String]("cid") -> r).toMap
    // the reference outer-joins the clusters TABLE, so entry-less clusters
    // (x0/x1) appear with NaN stats; we compare the stats-bearing cids
    val withStats = golden.filter { case (_, g) => Option(g.getAs[Any]("times_entered")).isDefined }
    assert(withStats.keySet.subsetOf(ours.keySet))
    withStats.foreach { case (cid, g) =>
      val o = ours.get(cid)
      if (o.isDefined) {
        assert(o.get.getAs[Long]("times_entered").toDouble ===
          g.getAs[Any]("times_entered").toString.toDouble, s"cid=$cid")
        for (c <- Seq("total_duration", "mean_duration", "std_duration",
          "max_duration", "min_duration", "mean_ti_between_visits")) {
          assert(approx(optD(o.get, c), optD(g, c), 2e-3), s"cid=$cid col=$c ${optD(o.get, c)} vs ${optD(g, c)}")
        }
      }
    }
  }

  test("get_daily_metrics matches the reference (14 days over some_data)") {
    import graft.operators.DailyFeatures
    val enriched = Motion.processVelocities(someData)
      .withColumn("date", col("ts").cast("date"))
      .withColumn("cid",
        concat(lit("x"), pmod(floor(col("lat") * 1e5).cast("long"), lit(3L)).cast("string")))
    // hours_in_top3 now comes from daily() itself (folded into the wide agg)
    val daily = DailyFeatures.daily(enriched, refRounding = true)
      .join(DailyFeatures.sleepEstimate(enriched, refRounding = true), Seq("user_id", "date"))
    val ours = daily.orderBy("date").collect()

    val golden = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(res("golden_daily.csv")).orderBy("date").collect()
    assert(ours.length === golden.length)
    val numeric = Seq("location_variance", "hours_stationary_nhw",
      "hours_stationary", "hours_walking", "hours_active", "hours_powered_vehicle",
      "hours_high_speed_transportation", "distance_stationary", "distance_walking",
      "distance_active", "distance_powered_vehicle", "distance_high_speed_transportation",
      "hours_in_home", "hours_in_work", "hours_in_top3", "hours_of_sleep")
    var bad = 0
    ours.zip(golden).foreach { case (a, b) =>
      val ok =
        a.getAs[Long]("hours_accounted_for") == b.getAs[Any]("hours_accounted_for").toString.toLong &&
        a.getAs[Long]("number_of_clusters") == b.getAs[Any]("number_of_clusters").toString.toLong &&
        a.getAs[Boolean]("came_to_work") == b.getAs[Any]("came_to_work").toString.toBoolean &&
        numeric.forall(c => approx(optD(a, c), optD(b, c), 0.0))
      if (!ok) {
        bad += 1
        if (bad <= 2) numeric.foreach { c =>
          if (!approx(optD(a, c), optD(b, c), 0.0)) info(s"col=$c ours=${optD(a, c)} golden=${optD(b, c)}")
        }
      }
    }
    assert(bad === 0, s"$bad of ${ours.length} days diverge")
  }

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
