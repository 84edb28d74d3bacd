package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Motion-feature operators: per-point velocity metrics + discrete binning,
  * minute resampling, and stationary-gap imputation.
  *
  * Reference semantics (kept exactly, quirks included):
  *   - process_velocities gscap/gps.py:799-854: lag-1 window per user sorted
  *     by ts; the first row of each partition carries nulls with
  *     binning='null'; pairs with Δt > 18 h, and 'active' pairs with
  *     Δt > 12 h, are fully nulled (gps.py:820-829).
  *   - discrete_velocity gscap/gps.py:857-937: Δt uses Python
  *     `timedelta.seconds`, i.e. **modulo 86400** (gps.py:886-889) — a
  *     reference quirk preserved here; displacement rounds half-even to 1 dp,
  *     velocity to 3 dp (np.round → bround).
  *   - resample_gps_intervals gscap/gps.py:1757-1780: truncate ts to the
  *     minute, mean lat/lon per group.
  *   - impute_between / impute_stationary_coordinates gscap/gps.py:1611-1746:
  *     fill endpoint-exclusive `freq`-spaced points between consecutive
  *     stationary fixes ≤75 m and ≤12 h apart, linear lat/lon interpolation.
  *
  * Scale notes: everything is window-over-(user_id) + hash-agg — shuffles
  * once on user_id, no driver-side iteration; expressions are all built-in →
  * whole-stage codegen. At 10^12 rows the user_id partitioning is the
  * natural co-location key and AQE handles stragglers.
  */
object Motion {

  val Bins = Seq("stationary", "walking", "active", "powered_vehicle", "high_speed_transportation")

  /** Discrete velocity bin from (meters, seconds, velocity) — the CASE chain
    * of gscap/gps.py:896-930. Null-safe: NaN/null velocity falls through to
    * 'anomaly' exactly like Python NaN comparisons do.
    */
  def binning(meters: Column, velocity: Column): Column =
    when(meters >= 0.0 && meters < 4.9, "stationary")
      .when(velocity > 0.0 && velocity < 0.7, "stationary")
      .when(velocity < 1.5, "walking")
      .when(velocity < 5.9, "active")
      .when(velocity < 67.056, "powered_vehicle")
      .when(velocity < 312.928, "high_speed_transportation")
      .otherwise("anomaly")

  /** Full per-point velocity pipeline. Input: (user_id, event_id, ts, lat, lon).
    * Output adds displacement (m, 1dp), time_delta (s, mod-86400), velocity
    * (m/s, 3dp), binning.
    *
    * Staged evaluation (optimization guide §1.2 step 2, r6): the previous
    * formulation inlined `lag(...)` and the haversine/Δt subtrees into every
    * reference inside the CASE chains — ExtractWindowExpressions does NOT
    * dedup equal lag occurrences, so the physical Window carried 187 offset
    * frames (plans/r06/gps_velocity_before.txt) and the output Project
    * re-evaluated the trig-heavy haversine ~30× per row. Here the three lags
    * ride ONE struct frame and meters/secs/vel/bin are materialized once as
    * their own projections (multi-referenced non-cheap aliases survive
    * CollapseProject — the Poi.parseGmap lesson, CLAUDE.md). Every staged
    * expression tree is the SAME tree as before, evaluated once — identical
    * IEEE doubles, identical output columns.
    */
  def processVelocities(gpsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val staged = gpsDf
      .withColumn("__prev", lag(struct(col("ts"), col("lat"), col("lon")), 1).over(w))
    val pTs  = col("__prev").getField("ts")
    val pLat = col("__prev").getField("lat")
    val pLon = col("__prev").getField("lon")

    // Python timedelta.seconds semantics: floor of the |Δt| TOTAL seconds,
    // mod 86400 (gps.py:886-889). Computed on microseconds — flooring each
    // endpoint first (unix_timestamp) would overstate sub-second gaps.
    val staged2 = staged
      .withColumn("__meters", Geo.haversineMeters(pLat, pLon, col("lat"), col("lon")))
      .withColumn("__secs", pmod(
        floor(abs(unix_micros(col("ts")) - unix_micros(pTs)) / 1e6).cast("long"),
        lit(86400L)))
    val staged3 = staged2
      .withColumn("__vel",
        when(col("__secs") =!= 0L, col("__meters") / col("__secs").cast("double")))
      .withColumn("__bin", binning(col("__meters"), col("__vel")))

    // guards gps.py:820-829: Δt>18h → nulled row; active & Δt>12h → nulled row
    val guarded = when(pTs.isNull, "null")
      .when(col("__secs") > 18L * 3600L, "null")
      .when(col("__bin") === "active" && col("__secs") > 12L * 3600L, "null")
      .otherwise(col("__bin"))
    val staged4 = staged3.withColumn("__g", guarded)

    val keepMetrics = col("__g") =!= "null" && col("__g") =!= "anomaly"
    staged4
      .withColumn("displacement", when(keepMetrics, bround(col("__meters"), 1)))
      .withColumn("time_delta",   when(keepMetrics, col("__secs")))
      .withColumn("velocity",     when(keepMetrics, bround(col("__vel"), 3)))
      .withColumn("binning",      col("__g"))
      .drop("__prev", "__meters", "__secs", "__vel", "__bin", "__g")
  }

  /** Minute resample: mean lat/lon per (user, minute); ts = the minute key.
    * Reference: resample_gps_intervals gscap/gps.py:1757-1780 (single hash
    * aggregation; partial/map-side combine is free from Catalyst).
    */
  def resampleMinutes(gpsDf: DataFrame): DataFrame =
    gpsDf
      .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("ts"))
      .agg(avg("lat").as("lat"), avg("lon").as("lon"), count(lit(1)).as("n_points"))

  /** W7 (gps.py:1716-1731): the first record of each (user, day) gets
    * time_delta = seconds since local midnight (instead of the cross-day
    * lag), so daily dwell sums only count into the current day. Applies on
    * top of processVelocities output.
    */
  def firstOfDayTimeDelta(df: DataFrame): DataFrame = {
    // ALL rows sharing the day's earliest ts are rewritten (the reference
    // compares ts == min ts, gps.py:1725-1727); 'null'-binned rows are
    // re-nulled afterwards (gps.py:1734-1736)
    val w = Window.partitionBy(col("user_id"), col("ts").cast("date"))
    val sinceMidnight = unix_timestamp(col("ts")) - unix_timestamp(date_trunc("day", col("ts")))
    df.withColumn("time_delta",
      when(col("ts") === min(col("ts")).over(w) && col("binning") =!= "null", sinceMidnight)
        .otherwise(col("time_delta")))
  }

  /** Stationary-gap imputation (gscap/gps.py:1611-1746): between consecutive
    * points that are ≤ maxMeters apart and ≤ maxGapSec apart, generate
    * endpoint-exclusive points every `stepSec` with linearly interpolated
    * coordinates. Implemented as sequence()+explode (built-in generator) —
    * fully distributed, no driver loop.
    */
  def imputeStationary(gpsDf: DataFrame,
                       stepSec: Long = 600L,
                       maxMeters: Double = 75.0,
                       maxGapSec: Long = 12L * 3600L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // three primitive offset frames + staged meters/Δt (same dedup rationale
    // as [[processVelocities]]: un-staged, each reference re-expanded its
    // lag into a separate window frame — 25 frames in the r5 plan — and
    // re-ran the haversine per reference). Primitive lags, NOT one struct
    // lag: measured on sf0.1, the struct column riding the shuffle + window
    // buffer cost ~0.5 s while three primitive frames are near-free here
    // (the imputed output is ~19× the input, so the window is a small
    // fraction of this operator — unlike processVelocities).
    val staged = gpsDf
      .withColumn("prev_ts",  lag("ts", 1).over(w))
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))

    // eligibility mirrors impute_between (gps.py:1625-1630): the pair's
    // discrete bin must be 'stationary', rounded displacement ≤ maxMeters,
    // and the mod-86400 Δt (timedelta.seconds quirk) ≤ maxGapSec; the fill
    // range itself spans the REAL gap (pandas date_range semantics)
    val staged2 = staged
      .withColumn("__meters",
        Geo.haversineMeters(col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))
      .withColumn("__secs_mod",
        pmod(abs(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))), lit(86400L)))
    val vel = when(col("__secs_mod") =!= 0L, col("__meters") / col("__secs_mod").cast("double"))
    val gapSec = unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
    val eligible = col("prev_ts").isNotNull &&
      binning(col("__meters"), vel) === "stationary" &&
      bround(col("__meters"), 1) <= maxMeters &&
      col("__secs_mod") <= maxGapSec &&
      gapSec > stepSec

    // endpoint-exclusive timestamps: prev_ts + step, ..., < ts. The
    // eligibility guard lives INSIDE the generator (when → null → no rows),
    // not in a Filter: a Filter above the staging projections gets pushed
    // through them, re-substituting the haversine/binning trees into the
    // predicate (pushdown ignores cost — CLAUDE.md); the generator
    // evaluates the staged columns exactly once per row. Ineligible and
    // first-of-partition rows yield null → zero generated rows, identical
    // to the filtered form (eligible ⇒ gap > stepSec ⇒ non-empty range).
    val filled = staged2
      .select(
        col("user_id"), col("event_id"),
        col("prev_ts"), col("prev_lat"), col("prev_lon"), col("lat"), col("lon"), col("ts"),
        posexplode(when(eligible, sequence(
          unix_timestamp(col("prev_ts")) + stepSec,
          unix_timestamp(col("ts")) - 1L,
          lit(stepSec)))).as(Seq("pos", "fill_sec"))
      )
      .withColumn("n_fill",
        floor((unix_timestamp(col("ts")) - lit(1L) - (unix_timestamp(col("prev_ts")) + stepSec)) / stepSec) + 1L)
      .select(
        col("user_id"),
        lit(-1L).as("event_id"),
        timestamp_seconds(col("fill_sec")).as("ts"),
        // np.linspace over the kept timestamps, endpoints inclusive in value
        // space (gps.py:1645-1646): count n_fill → fraction pos/(n_fill-1),
        // degenerate n_fill==1 → start value.
        when(col("n_fill") === 1L, col("prev_lat"))
          .otherwise(col("prev_lat") + (col("lat") - col("prev_lat")) * (col("pos").cast("double") / (col("n_fill") - 1L).cast("double")))
          .as("lat"),
        when(col("n_fill") === 1L, col("prev_lon"))
          .otherwise(col("prev_lon") + (col("lon") - col("prev_lon")) * (col("pos").cast("double") / (col("n_fill") - 1L).cast("double")))
          .as("lon")
      )

    gpsDf.select("user_id", "event_id", "ts", "lat", "lon")
      .unionByName(filled)
  }
}
