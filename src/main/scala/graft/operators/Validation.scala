package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Input validation operators (SURVEY.md §2 B8/H10).
  *
  * Reference semantics:
  *   - lat_lon_range_check (gscap/utils.py:246-251): lat ∈ [-90, 90],
  *     lon ∈ [-180, 180] (the reference RAISES out of range; a distributed
  *     engine nulls/filters instead — one bad row must not kill the job);
  *   - PlaceRequest.__verify_location (gscap/gps.py:137-153): additionally
  *     (0, 0) is treated as invalid (`lat != 0 and lon != 0`);
  *   - zip sentinels (gscap/utils.py:102-118, 121-160): dd_from_zip miss →
  *     (0, 0); zip_from_dd miss / beyond distance_upper_bound → -1.
  *
  * All pure Column expressions — codegen'd, no UDF.
  */
object Validation {

  /** Range check only (utils.py:246-251). */
  def inRange(lat: Column, lon: Column): Column =
    lat.isNotNull && lon.isNotNull &&
      lat >= -90.0 && lat <= 90.0 && lon >= -180.0 && lon <= 180.0

  /** PlaceRequest.valid (gps.py:137-153): in range AND not the (0,0)
    * null-island sentinel.
    */
  def validCoords(lat: Column, lon: Column): Column =
    inRange(lat, lon) && !(lat === 0.0 && lon === 0.0)

  /** zip_from_dd's distance_upper_bound miss → -1 (utils.py:141-158): given
    * a 1-NN result (zip, d2), keep the zip only within maxd (euclidean
    * DEGREES, the reference KDTree metric — d2 is squared).
    */
  def zipWithin(zip: Column, d2: Column, maxdDeg: Double): Column =
    when(d2 <= maxdDeg * maxdDeg, zip).otherwise(lit(-1L))

  /** Apply PlaceRequest-style validation to a point frame: invalid rows get
    * their coordinates NULLED (the engine's analog of the reference's
    * raise/None) and flagged, valid rows pass through unchanged.
    */
  def validate(points: DataFrame, latCol: String = "lat", lonCol: String = "lon"): DataFrame = {
    val ok = validCoords(col(latCol), col(lonCol))
    points
      .withColumn("valid", ok)
      .withColumn(latCol, when(ok, col(latCol)))
      .withColumn(lonCol, when(ok, col(lonCol)))
  }
}
