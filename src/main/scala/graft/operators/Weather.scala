package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weather enrichment operators — summarize_report (gscap/weather.py:349-402)
  * and the cache-lookup join pattern (weather.py:317-331, gps.py:598-606).
  *
  * Daily summary semantics per (zipcode, lat, lon, date):
  *   - median / IQR via np.nanpercentile(…, [25,50,75],
  *     interpolation='nearest'): index = round-half-EVEN(q·(n−1)) into the
  *     sorted non-null values (numpy np.around tie behavior) — implemented
  *     as an explicit frac-comparison expression so Spark and any SQL oracle
  *     compute identical indices (no engine-specific rounding function);
  *   - mean = nanmean, std = nanstd (ddof=0 → stddev_pop);
  *   - precip_sum = plain sum (empty → 0.0).
  *
  * Scale notes: one hash aggregation; collect_list per group is bounded (24
  * hourly rows per key) so the sort-in-expression is O(24 log 24) per group.
  */
object Weather {

  /** Nearest-interpolation percentile over a collected value array.
    * `q` ∈ [0,1] must be binary-exact (0.25/0.5/0.75) so pos arithmetic is
    * portable.
    */
  def quantileNearest(values: Column, q: Double): Column = {
    val arr  = array_sort(values)
    val pos  = lit(q) * (size(arr) - 1).cast("double")
    val r    = floor(pos)
    val frac = pos - r
    val idx  = when(frac > 0.5, r + 1)
      .when(frac < 0.5, r)
      .otherwise(when(r % 2 === 0, r).otherwise(r + 1))
    // empty group (a metric entirely null for the day): np.nanpercentile
    // yields NaN → null here; the guard also keeps the computed index
    // (idx+1 = 0 on empty) away from try_element_at's INVALID_INDEX_OF_ZERO
    when(size(arr) > 0, try_element_at(arr, idx.cast("int") + lit(1)))
  }

  /** Daily summary of hourly reports. Input columns: zipcode, lat, lon,
    * date, cloud_cover, dew_point, humidity, temperature, precip_intensity
    * (nulls allowed = missing hours, skipped like NaN in the reference).
    */
  def dailySummary(hourly: DataFrame): DataFrame = {
    def stats(c: String, out: String): Seq[Column] = {
      val vals = collect_list(col(c)) // skips nulls, like nan-skipping
      Seq(
        avg(col(c)).as(s"${out}_mean"),
        stddev_pop(col(c)).as(s"${out}_std"),
        quantileNearest(vals, 0.5).as(s"${out}_median"),
        (quantileNearest(vals, 0.75) - quantileNearest(vals, 0.25)).as(s"${out}_IQR"))
    }
    val aggs =
      stats("cloud_cover", "cloud_cover") ++
      stats("dew_point", "dew_point") ++
      stats("humidity", "humidity") ++
      stats("temperature", "temp") :+
      coalesce(sum(col("precip_intensity")), lit(0.0)).as("precip_sum")
    hourly.groupBy("zipcode", "lat", "lon", "date").agg(aggs.head, aggs.tail: _*)
  }

  /** verify_request front door (gscap/weather.py:500-560) + the noon anchor
    * of process_request (weather.py:414-419).
    *
    * Input rows: (req_id, zipcode nullable, lat nullable, lon nullable,
    * date). Non-null zipcode marks the 2-tuple (zipcode, date) form; null
    * zipcode the 3-tuple (lat, lon, date) form.
    *   - zip form: (lat, lon) = zip centroid (dd_from_zip,
    *     utils.py:102-118); unknown zip → (0,0) → request DROPPED
    *     (verify_zipcode_date_request returns None, weather.py:530-533);
    *   - latlon form: range check (the reference raises on out-of-range,
    *     weather.py:552-553 — the engine filters, one bad row must not kill
    *     the job); zipcode = nearest zip by euclidean-degree 1-NN
    *     (zip_from_dd with suppress_warnings=True → unbounded distance);
    *   - surviving requests are anchored at hour 12 of their date
    *     (process_request, weather.py:414-419).
    *
    * zipDim: (zipcode, d_lat, d_lon) — broadcast-sized; the kNN is the J5
    * operator (broadcast argmin aggregation, no point shuffle).
    */
  def verifyRequests(requests: DataFrame, zipDim: DataFrame): DataFrame = {
    val zipForm = requests.where(col("zipcode").isNotNull)
      .join(broadcast(zipDim.withColumnRenamed("zipcode", "z_zip")),
        col("zipcode") === col("z_zip"), "left")
      .select(col("req_id"), col("zipcode"),
        coalesce(col("d_lat"), lit(0.0)).as("lat"),
        coalesce(col("d_lon"), lit(0.0)).as("lon"), col("date"))
      .where(!(col("lat") === 0.0 && col("lon") === 0.0))
    val latlonOk = requests.where(col("zipcode").isNull)
      .where(Validation.inRange(col("lat"), col("lon")))
      .select("req_id", "lat", "lon", "date")
    val latlonForm = Spatial.nearestNeighbor(latlonOk, zipDim, "zipcode", Seq("req_id"))
      .select(col("req_id"), col("zipcode"), col("lat"), col("lon"), col("date"))
    zipForm.unionByName(latlonForm)
      .withColumn("noon_ts", col("date").cast("timestamp") + expr("INTERVAL 12 HOURS"))
  }

  /** Cache-lookup join (A2/J3/G11): left-join requests against the cache
    * relation on its composite key; unresolved rows are the misses that a
    * batch fetch (pre-materialized table at this engine's scale) fills.
    * Returns the joined frame plus hit/miss counters per request group.
    */
  def cacheLookup(requests: DataFrame, cache: DataFrame, keys: Seq[String]): DataFrame =
    requests.join(broadcast(cache), keys, "left")

  def hitMissCounts(joined: DataFrame, presentCol: String, group: Seq[String]): DataFrame =
    joined.groupBy(group.map(col): _*)
      .agg(
        sum(when(col(presentCol).isNotNull, 1L).otherwise(0L)).as("hits"),
        sum(when(col(presentCol).isNull, 1L).otherwise(0L)).as("misses"))
}
