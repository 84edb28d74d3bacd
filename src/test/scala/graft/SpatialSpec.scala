package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Spatial join operators: ray-cast PIP, polyfill, fence, anti-join,
  * salted join equivalence.
  */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("rayCast: triangle containment, boundary-adjacent points") {
    val tri = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0)) // right triangle
    val pts = Seq(
      (1L, 2.0, 2.0, true),   // inside
      (2L, 6.0, 6.0, false),  // outside hypotenuse
      (3L, -1.0, 5.0, false), // left of it
      (4L, 4.9999, 4.9999, true),
      (5L, 9.0, 0.5, true)
    ).toDF("id", "lat", "lon", "expected")
    val r = pts.withColumn("in", Spatial.rayCast(col("lat"), col("lon"), tri)).collect()
    r.foreach(row => assert(row.getAs[Boolean]("in") === row.getAs[Boolean]("expected"), row.toString))
  }

  test("polyfillCells covers the polygon bounding box at the given res") {
    val cells = Spatial.polyfillCells(Seq((40.0, -75.0), (40.1, -75.0), (40.0, -74.9)), 12)
    assert(cells.nonEmpty)
    // every vertex's cell is covered
    Seq((40.0, -75.0), (40.1, -75.0), (40.0, -74.9), (40.05, -74.95)).foreach { case (la, lo) =>
      assert(cells.contains(graft.functions.Grid.cellId(la, lo, 12)))
    }
  }

  test("pointInRect is half-open on the max edges") {
    val rects = Seq((0, 1.0, 2.0, 10.0, 20.0)).toDF("poly_id", "lat_min", "lat_max", "lon_min", "lon_max")
    val pts = Seq((1L, 1.0, 10.0), (2L, 2.0, 15.0), (3L, 1.5, 20.0), (4L, 1.5, 15.0))
      .toDF("id", "lat", "lon")
    val in = Spatial.pointInRect(pts, rects).select("id").as[Long].collect().toSet
    assert(in === Set(1L, 4L)) // lat_max=2.0 and lon_max=20.0 excluded
  }

  test("farFromAll excludes points within the radius of any center") {
    val centers = Seq((40.0, -75.0), (41.0, -76.0)).toDF("c_lat", "c_lon")
    val pts = Seq(
      (1L, 40.0001, -75.0),  // ~11 m from center 1
      (2L, 40.5, -75.5),     // far from both
      (3L, 41.0005, -76.0)   // ~55 m from center 2
    ).toDF("id", "lat", "lon")
    val far = Spatial.farFromAll(pts, centers, 100.0).select("id").as[Long].collect().toSet
    assert(far === Set(2L))
  }

  test("salted join equals plain join") {
    val fact = (1L to 1000L).map(i => (i, i % 3)).toDF("id", "k")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val plain = fact.join(dim, Seq("k")).select("id", "v").collect().map(_.toString).sorted
    val salted = Spatial.saltedJoin(fact, dim, Seq("k"), "id", 8)
      .select("id", "v").collect().map(_.toString).sorted
    assert(plain.toSeq === salted.toSeq)
  }

  test("cell-ring kNN equals brute-force kNN") {
    var seed = 11L
    def next(): Double = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 11).toDouble / (1L << 53).toDouble }
    val pts = (1L to 300L).map(i => (i, 39.5 + next(), -75.5 + next())).toDF("event_id", "lat", "lon")
    val dim = (1 to 12).map(i => (i, 39.5 + next(), -75.5 + next())).toDF("n_key", "d_lat", "d_lon")
    val brute = Spatial.nearestNeighbor(pts, dim, "n_key", Seq("event_id"))
      .select("event_id", "n_key").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ring = Spatial.nearestNeighborCellRing(pts, dim, "n_key", "event_id", res = 9, maxRings = 2)
      .select("event_id", "n_key").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ring.size === 300)
    assert(ring === brute)
  }

  test("nearestNeighbor picks the euclidean-degree argmin with key tie-break") {
    val pts = Seq((1L, 40.0, -75.0)).toDF("event_id", "lat", "lon")
    val dim = Seq((10, 40.001, -75.0), (11, 40.001, -75.0), (12, 42.0, -70.0))
      .toDF("n_key", "d_lat", "d_lon")
    val r = Spatial.nearestNeighbor(pts, dim, "n_key", Seq("event_id")).select("n_key").head
    assert(r.getInt(0) === 10) // exact tie between 10 and 11 → smaller key
  }

  test("nearestNeighbor plan is a hash aggregation — no window, no sort") {
    // the argmin must be min(struct) with map-side partial combine, not a
    // row_number window over the scored join (which shuffles AND sorts the
    // full N×dim rows)
    val pts = (1L to 50L).map(i => (i, 40.0 + i * 1e-4, -75.0)).toDF("event_id", "lat", "lon")
    val dim = (1 to 5).map(i => (i, 40.0 + i * 1e-3, -75.0)).toDF("n_key", "d_lat", "d_lon")
    val plan = Spatial.nearestNeighbor(pts, dim, "n_key", Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Sort"), s"sort in plan:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"no hash agg in plan:\n$plan")
  }
}
