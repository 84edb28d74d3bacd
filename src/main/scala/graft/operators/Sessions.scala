package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Visit sessionization — the reference's get_cluster_times pipeline
  * (gscap/gps.py:1279-1363) as window + hash-agg plans:
  *
  *   W2 `cid_of_day` (gps.py:1280-1292): per (user, date), a running counter
  *      that increments whenever cid changes vs the previous row → `pos`.
  *   W3 `collapse` (gps.py:1294-1305): per (user, date, pos, cid):
  *      time_in = first ts, time_out = last ts, n_points, median lat/lon
  *      (exact percentile for pandas-median parity, gps.py:1303-1304).
  *   W4 `merge_nights` (gps.py:1307-1321): if the first visit of a day has
  *      the same cid as the last visit of the previous day, stretch
  *      yesterday's time_out to 23:59:59 and today's time_in to 00:00:00.
  *   duration rounds to 1 s; midpoint = time_in + duration/2 (gps.py:1350-51).
  *
  * Scale notes: one shuffle on (user_id) for the ordering window, then one
  * hash aggregation; the W4 cross-midnight fix is a lag/lead over the
  * *collapsed* visit table (orders of magnitude smaller than points).
  */
object Sessions {

  /** Input: points with (user_id, event_id, ts, date, cid, binning).
    * Stationary rows only enter sessionization (gps.py:1328-1330).
    */
  def visits(points: DataFrame): DataFrame = {
    val stationary = points.where(col("binning") === "stationary")

    // W2: pos — count of cid changes so far within (user, date), ts order.
    // The lag is staged once (r6): inlining it put TWO offset frames in the
    // Window; a staged column costs one.
    val wDay = Window.partitionBy("user_id", "date").orderBy("ts", "event_id")
    val withPrev = stationary.withColumn("__pcid", lag("cid", 1).over(wDay))
    val changed = when(col("__pcid").isNull || col("__pcid") =!= col("cid"), 1)
      .otherwise(0)
    val withPos = withPrev.withColumn(
      "pos", sum(changed).over(wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__pcid")

    // W3: collapse each (user, date, pos, cid) run into one visit
    val collapsed = withPos
      .groupBy("user_id", "date", "pos", "cid")
      .agg(
        min("ts").as("time_in"),
        max("ts").as("time_out"),
        count(lit(1)).as("n_points"),
        expr("percentile(lat, 0.5)").as("lat"),
        expr("percentile(lon, 0.5)").as("lon"))

    // W4: midnight merge over the collapsed visits
    val wVis  = Window.partitionBy("user_id").orderBy("date", "pos")
    val pCid  = lag("cid", 1).over(wVis)
    val pDate = lag("date", 1).over(wVis)
    val nCid  = lead("cid", 1).over(wVis)
    val nDate = lead("date", 1).over(wVis)
    val nPos  = lead("pos", 1).over(wVis)

    val firstOfDay = col("pos") === 1
    val mergesWithPrev = firstOfDay && pCid === col("cid") && pDate === date_sub(col("date"), 1)
    val nextMergesWithUs = (nPos === 1) && nCid === col("cid") && nDate === date_add(col("date"), 1)

    val adjusted = collapsed
      .withColumn("time_in",
        when(mergesWithPrev, col("date").cast("timestamp")).otherwise(col("time_in")))
      .withColumn("time_out",
        when(nextMergesWithUs,
          (col("date").cast("timestamp") + expr("INTERVAL 23 HOURS 59 MINUTES 59 SECONDS")))
          .otherwise(col("time_out")))

    // duration = (out − in).round('1s') and midpoint = (in + duration/2)
    // .round('1s') — pandas rounds HALF-EVEN on the .5 s ties that arise
    // from sub-second fixes and odd durations (gps.py:1350-1351); computed
    // in integer microseconds with an explicit tie branch so the SQL twin
    // is portable (DuckDB round is half-away)
    def roundSecHalfEven(us: org.apache.spark.sql.Column) = {
      val s    = floor(us / 1e6).cast("long")
      val frac = us - s * 1000000L
      when(frac > 500000L, s + 1)
        .when(frac < 500000L, s)
        .otherwise(when(s % 2 === 0, s).otherwise(s + 1))
    }
    val durUs = unix_micros(col("time_out")) - unix_micros(col("time_in"))
    val adjusted2 = adjusted.withColumn("duration", roundSecHalfEven(durUs))
    val midUs = unix_micros(col("time_in")) + col("duration") * 500000L
    adjusted2.withColumn("midpoint", timestamp_seconds(roundSecHalfEven(midUs)))
  }

  /** Per-cluster visit statistics — cluster_metrics (gscap/gps.py:656-793).
    * Durations in hours, half-even 3 dp; mean inter-visit interval uses the
    * closed form (max−min)/(n−1) over midpoint epochs, algebraically equal
    * to the reference's mean of consecutive diffs on sorted midpoints
    * (gps.py:735-737). Noise visits (cid='xNot') are excluded (gps.py:662).
    */
  def clusterMetrics(visits: DataFrame): DataFrame =
    visits
      .where(col("cid") =!= "xNot")
      .groupBy("user_id", "cid")
      .agg(
        count(lit(1)).as("times_entered"),
        bround(sum("duration") / 3600.0, 3).as("total_duration"),
        bround(avg("duration") / 3600.0, 3).as("mean_duration"),
        bround(stddev_samp("duration") / 3600.0, 3).as("std_duration"),
        bround(max("duration") / 3600.0, 3).as("max_duration"),
        bround(min("duration") / 3600.0, 3).as("min_duration"),
        bround(
          ((max(unix_timestamp(col("midpoint"))) - min(unix_timestamp(col("midpoint")))).cast("double")
            / when(count(lit(1)) > 1, (count(lit(1)) - 1).cast("double"))) / 3600.0, 3)
          .as("mean_ti_between_visits"))
}
