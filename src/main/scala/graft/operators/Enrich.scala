package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Notebook enrichment joins (SURVEY.md §2 J10) — the dimension-building
  * merges from the reference's analysis notebooks, as plain broadcast equi
  * joins.
  *
  *   - zipGazetteer (notebooks/zipcodes.ipynb cells 5-8): business-pattern
  *     totals × gazetteer centroids on zipcode, × state codes on
  *     stabbr=Code (dropping the join key, renaming State→state), coords
  *     rounded to 5 dp (np.round half-even → bround), fixed column
  *     projection, × timezone table on zipcode.
  *   - countyRankings (notebooks/county_health_rankings.ipynb cells 1-4):
  *     county fips key built as zfill(2) state + zfill(3) county, health
  *     rankings LEFT-joined on it (unranked counties keep null ranks).
  *
  * All dims are broadcast-sized; the engine shape is broadcast hash joins
  * with no shuffle of any side at gazetteer scale (~40k zips).
  */
object Enrich {

  def zipGazetteer(zbp: DataFrame, gaz: DataFrame, states: DataFrame, tz: DataFrame): DataFrame =
    zbp.join(gaz, Seq("zipcode"))
      .join(broadcast(states), col("stabbr") === col("Code"))
      .drop("Code").withColumnRenamed("State", "state")
      .withColumn("lat", bround(col("lat"), 5))
      .withColumn("lon", bround(col("lon"), 5))
      .select("zipcode", "city", "county", "state", "stabbr", "lat", "lon")
      .join(tz.select("zipcode", "timezone"), Seq("zipcode"))

  def countyRankings(counties: DataFrame, rankings: DataFrame): DataFrame =
    counties.withColumn("fips",
        concat(lpad(col("state_fips").cast("string"), 2, "0"),
          lpad(col("county_fips").cast("string"), 3, "0")))
      .join(broadcast(rankings), Seq("fips"), "left")
}
