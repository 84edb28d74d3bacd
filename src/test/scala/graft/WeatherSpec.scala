package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.Weather

/** Weather daily-summary parity: nanpercentile nearest-interpolation with
  * half-even index ties (gscap/weather.py:353-367), population std,
  * precip_sum (test_weather.py pins precip_sum semantics — plain sum of the
  * hourly intensities, 11.5-style).
  */
class WeatherSpec extends SparkSpec {
  import spark.implicits._

  test("quantileNearest: numpy 'nearest' with half-even tie on .5 positions") {
    // n=3 → q25 pos 0.5 → even index 0; q75 pos 1.5 → even index 2
    val df = Seq((1, 10.0), (1, 20.0), (1, 30.0)).toDF("k", "v")
      .groupBy("k")
      .agg(
        Weather.quantileNearest(collect_list(col("v")), 0.25).as("q25"),
        Weather.quantileNearest(collect_list(col("v")), 0.5).as("q50"),
        Weather.quantileNearest(collect_list(col("v")), 0.75).as("q75"))
    val r = df.head
    assert(r.getDouble(1) === 10.0) // np.percentile([10,20,30],25,'nearest') = 10
    assert(r.getDouble(2) === 20.0)
    assert(r.getDouble(3) === 30.0)
  }

  test("quantileNearest: non-tie positions round to nearest") {
    // n=5 → q25 pos 1.0 exact; q75 pos 3.0
    val df = Seq.tabulate(5)(i => (1, (i + 1) * 10.0)).toDF("k", "v")
      .groupBy("k")
      .agg(Weather.quantileNearest(collect_list(col("v")), 0.25).as("q25"),
        Weather.quantileNearest(collect_list(col("v")), 0.75).as("q75"))
    val r = df.head
    assert(r.getDouble(1) === 20.0 && r.getDouble(2) === 40.0)
  }

  test("quantileNearest: all-null group yields null, not a crash") {
    // a day where the metric is entirely missing: np.nanpercentile → NaN;
    // here → null (and no INVALID_INDEX_OF_ZERO from the empty list)
    val df = Seq((1, Option.empty[Double]), (1, Option.empty[Double])).toDF("k", "v")
      .groupBy("k")
      .agg(Weather.quantileNearest(collect_list(col("v")), 0.75).as("q75"))
    assert(df.head.isNullAt(1))
  }

  test("dailySummary: stats per key, precip sum, null skipping") {
    val d = Date.valueOf("2019-06-01")
    val hourly = Seq(
      (47579L, 38.1, -86.9, d, Some(0.5), Some(10.0), Some(0.2), Some(20.0), Some(5.0)),
      (47579L, 38.1, -86.9, d, Some(0.7), Some(12.0), Some(0.4), Some(22.0), Some(6.5)),
      (47579L, 38.1, -86.9, d, None,      Some(14.0), Some(0.6), Some(24.0), None)
    ).toDF("zipcode", "lat", "lon", "date", "cloud_cover", "dew_point", "humidity", "temperature", "precip_intensity")
    val r = Weather.dailySummary(hourly).head
    assert(math.abs(r.getAs[Double]("cloud_cover_mean") - 0.6) < 1e-12)   // nanmean skips null
    assert(r.getAs[Double]("cloud_cover_median") === 0.5)                 // n=2, pos 0.5 → even idx 0
    assert(r.getAs[Double]("dew_point_median") === 12.0)
    assert(r.getAs[Double]("temp_IQR") === 4.0)                           // nearest: 24-20
    assert(r.getAs[Double]("precip_sum") === 11.5)                        // test_weather.py pinned style
    // nanstd ddof=0 of (10,12,14) = sqrt(8/3)
    assert(math.abs(r.getAs[Double]("dew_point_std") - math.sqrt(8.0 / 3.0)) < 1e-12)
  }

  test("dailySummary matches the reference's summarize_report (golden, NaN-skipping)") {
    // same deterministic hourly frame as tools/gen_golden.py §7
    val rows = (0 until 72).map { e =>
      val cc: Option[Double] = if (e % 11 == 0) None else Some((e * 7) % 100 / 100.0)
      (47579L, 38.1, -86.9, Date.valueOf(f"2019-06-0${e / 24 + 1}%d"),
        cc, Some((e * 11) % 150 / 10.0), Some((e * 3) % 100 / 100.0),
        Some((e % 200) / 10.0), Some((e * 13) % 20 / 20.0))
    }
    import spark.implicits._
    val hourly = rows.toDF("zipcode", "lat", "lon", "date",
      "cloud_cover", "dew_point", "humidity", "temperature", "precip_intensity")
    val ours = Weather.dailySummary(hourly).orderBy("date").collect()
    val golden = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(getClass.getResource("/golden_weather.csv").toString).orderBy("date").collect()
    assert(ours.length === 3)
    val cols = Seq("cloud_cover_mean", "cloud_cover_std", "cloud_cover_median", "cloud_cover_IQR",
      "dew_point_mean", "dew_point_std", "dew_point_median", "dew_point_IQR",
      "humidity_mean", "humidity_std", "humidity_median", "humidity_IQR",
      "temp_mean", "temp_std", "temp_med", "temp_IQR", "precip_sum")
    ours.zip(golden).foreach { case (a, b) =>
      cols.foreach { c =>
        val oc = if (c == "temp_med") "temp_median" else c
        val ov = Option(a.getAs[Any](oc)).map(_.toString.toDouble)
        val gv = Option(b.getAs[Any](c)).map(_.toString.toDouble)
        assert(ov.isDefined && gv.isDefined && math.abs(ov.get - gv.get) < 1e-9,
          s"col=$c ours=$ov golden=$gv")
      }
    }
  }

  test("cache lookup hit/miss counters (G11, gps.py:544-545)") {
    val reqs = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("zipcode", "key")
    val cache = Seq((1L, "a", "payload")).toDF("zipcode", "key", "cached_report")
    val joined = Weather.cacheLookup(reqs, cache, Seq("zipcode", "key"))
    val counts = Weather.hitMissCounts(joined, "cached_report", Seq("zipcode"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts(1L) === ((1L, 1L)))
    assert(counts(2L) === ((0L, 1L)))
  }
}
