package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Geo, Grid}
import graft.operators.Motion
import graft.sources.Tables

/** Composed GPS pipelines shared by SparkEntry queries, tests, and bench.
  * Each is the Column-expression twin of an OracleSql CTE.
  */
object Pipelines {

  /** Per-user home/work site coordinates (twin of OracleSql.hlat/…). */
  def homeLat: Column = lit(40.0) + (col("user_id") % 5).cast("double") * 1e-2
  def homeLon: Column = lit(-75.0) + (col("user_id") % 3).cast("double") * 1e-2
  def workLat: Column = homeLat + 4e-3
  def workLon: Column = homeLon + 4e-3

  /** GPS stream → velocity metrics (twin of OracleSql.velCtes). */
  def velocities(spark: SparkSession, sfDir: String): DataFrame =
    Motion.processVelocities(Tables.gps(spark, sfDir))

  /** Velocity points + date + level-16 S2 cell (≈150 m) + fence-labeled cid
    * (twin of OracleSql.labCtes). cid ∈ {home, work, x<cell16>} via 500 m
    * haversine fences around the per-user home/work sites — the J4 fence
    * relabel (gscap/gps.py:1124-1130) applied as a deterministic expression.
    */
  def labeledPoints(spark: SparkSession, sfDir: String): DataFrame = {
    val cell16 = Grid.cell(col("lat"), col("lon"), 16)
    velocities(spark, sfDir)
      .withColumn("date", col("ts").cast("date"))
      .withColumn("cid",
        when(Geo.haversineMeters(homeLat, homeLon, col("lat"), col("lon")) <= 500.0, "home")
          .when(Geo.haversineMeters(workLat, workLon, col("lat"), col("lon")) <= 500.0, "work")
          .otherwise(concat(lit("x"), cell16.cast("string"))))
  }
}
