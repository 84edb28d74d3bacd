package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column expressions — pure `Column` compositions (whole-stage
  * codegen'd, no UDFs anywhere in the hot path).
  *
  * Semantics derived from the reference implementation:
  *   - haversine: gscap/utils.py:204-228 (R=6371.0 km, atan2 form, meters)
  *   - euclidean-degrees metric: gscap/gps.py:1823-1826 (DBSCAN runs on raw
  *     lat/lon degrees with euclidean distance — a reference quirk we keep
  *     for fixture parity)
  */
object Geo {

  /** Mean Earth radius in meters (reference: gscap/utils.py:218 `r = 6371.0` km). */
  val EarthRadiusMeters: Double = 6371.0 * 1000.0

  /** Great-circle distance in meters, atan2 form for exact reference parity
    * (gscap/utils.py:221-228). Pure codegen-friendly expression.
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val rlat1 = radians(lat1)
    val rlat2 = radians(lat2)
    val sdlat = sin((radians(lat2) - radians(lat1)) / 2.0)
    val sdlon = sin((radians(lon2) - radians(lon1)) / 2.0)
    val a = sdlat * sdlat + cos(rlat1) * cos(rlat2) * (sdlon * sdlon)
    val c = atan2(sqrt(a), sqrt(lit(1.0) - a)) * 2.0
    c * EarthRadiusMeters
  }

  /** Squared euclidean distance on raw degrees — the reference's DBSCAN
    * metric (gscap/gps.py:1823-1826). Squared form avoids a sqrt when only
    * comparisons are needed; callers compare against eps².
    */
  def euclidDeg2(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)
}

/** np.round as a Column: half-even on the SCALED BINARY double
  * (numpy multiplies by 10^dp and rints), which differs from Spark's
  * bround (BigDecimal half-even on the decimal representation) exactly at
  * values whose scaled binary form is a representable .5 — the cases that
  * matter for fixture parity with numpy/pandas outputs.
  */
object NpRound {
  def apply(c: Column, dp: Int): Column = {
    val scale = math.pow(10, dp)
    val s     = c * scale
    val r     = floor(s)
    val frac  = s - r
    val n = when(frac > 0.5, r + 1)
      .when(frac < 0.5, r)
      .otherwise(when(pmod(r, lit(2.0)) === 0.0, r).otherwise(r + 1))
    n / scale
  }
}

/** Hierarchical spatial grid index filling the H3/S2 role in this engine.
  *
  * A cell id packs (resolution, yIndex, xIndex) into one long:
  *   cell = res << 58 | y << 29 | x
  * where at resolution r the world is split into 2^r × 2^r tiles over
  * lon ∈ [-180, 180), lat ∈ [-90, 90). Properties used by the engine:
  *   - integer-arithmetic codec → exact, portable, SQL-expressible (the
  *     DuckDB oracles recompute identical ids), codegen-friendly;
  *   - hierarchical: parent at res p is a pure bit shift → raster↔vector
  *     tile assignment (SURVEY.md §2 J12) is a deterministic expression;
  *   - k-ring neighborhoods are ±k index windows → distance-bounded joins
  *     become cell-equi joins (SURVEY.md §2 J4/J5/J6/J11).
  *
  * Resolution ↔ cell size at equator: width = 360/2^r degrees
  * (r=12 ≈ 9.8 km, r=15 ≈ 1.2 km, r=18 ≈ 153 m, r=20 ≈ 38 m).
  */
object Grid {
  val ResShift  = 58
  val YShift    = 29
  val MaxRes    = 28
  val IdxMask   = (1L << YShift) - 1

  /** Encode (lat, lon) → cell id at resolution `res`. Pure Column expr. */
  def cell(lat: Column, lon: Column, res: Int): Column = {
    require(res >= 0 && res <= MaxRes, s"res out of range: $res")
    val n = (1L << res).toDouble
    val xi = least(greatest(floor((lon + 180.0) / 360.0 * n), lit(0.0)), lit(n - 1)).cast("long")
    val yi = least(greatest(floor((lat + 90.0) / 180.0 * n), lit(0.0)), lit(n - 1)).cast("long")
    lit(res.toLong << ResShift) + yi * (1L << YShift) + xi
  }

  /** Resolution stored in a cell id. */
  def res(cell: Column): Column = shiftright(cell, ResShift)

  def xIndex(cell: Column): Column = cell.bitwiseAND(IdxMask)
  def yIndex(cell: Column): Column = shiftright(cell, YShift).bitwiseAND(IdxMask)

  /** Parent cell at a coarser resolution — pure integer shifts, exact. */
  def toParent(cell: Column, childRes: Int, parentRes: Int): Column = {
    require(parentRes <= childRes, "parent must be coarser")
    val d = childRes - parentRes
    lit(parentRes.toLong << ResShift) +
      shiftright(yIndex(cell), d) * (1L << YShift) +
      shiftright(xIndex(cell), d)
  }

  /** Cell center (lat, lon) — used for approximate distances between cells. */
  def centerLat(cell: Column, res: Int): Column = {
    val n = (1L << res).toDouble
    (yIndex(cell).cast("double") + 0.5) * (180.0 / n) - 90.0
  }
  def centerLon(cell: Column, res: Int): Column = {
    val n = (1L << res).toDouble
    (xIndex(cell).cast("double") + 0.5) * (360.0 / n) - 180.0
  }

  /** k-ring: array of all cells within a (2k+1)×(2k+1) index window around
    * `cell` (lon wraps, lat clamps). Expressed with `transform`+`sequence`
    * built-ins — a generator-free, codegen-friendly neighborhood expansion
    * used to turn radius predicates into cell-equi joins.
    */
  def kRing(cellCol: Column, resolution: Int, k: Int): Column = {
    val n    = 1L << resolution
    val side = 2 * k + 1
    val x    = xIndex(cellCol)
    val y    = yIndex(cellCol)
    val offs = sequence(lit(0), lit(side * side - 1))
    array_distinct(filter(
      transform(offs, i => {
        val dx = (i % side) - k
        val dy = floor(i / side).cast("int") - k
        val nx = pmod(x + dx, lit(n))
        val ny = y + dy
        when(ny >= 0 && ny < n,
          lit(resolution.toLong << ResShift) + ny * (1L << YShift) + nx)
      }),
      c => c.isNotNull
    ))
  }

  /** Scala-side encode (driver/test use; mirrors `cell` exactly). */
  def cellId(lat: Double, lon: Double, res: Int): Long = {
    val n  = (1L << res).toDouble
    val xi = math.min(math.max(math.floor((lon + 180.0) / 360.0 * n), 0.0), n - 1).toLong
    val yi = math.min(math.max(math.floor((lat + 90.0) / 180.0 * n), 0.0), n - 1).toLong
    (res.toLong << ResShift) | (yi << YShift) | xi
  }

  /** SQL fragment computing the same cell id (for oracle parity). The
    * literal forms (e-notation) force DOUBLE in DuckDB, matching Spark.
    */
  def cellSql(latExpr: String, lonExpr: String, resolution: Int): String = {
    val n    = (1L << resolution).toDouble
    val nLit = s"${(1L << resolution)}e0"
    val nm1  = s"${(1L << resolution) - 1}e0"
    val tag  = resolution.toLong << ResShift
    s"(CAST($tag AS BIGINT) " +
      s"+ CAST(least(greatest(floor(($latExpr + 9e1) / 18e1 * $nLit), 0e0), $nm1) AS BIGINT) * ${1L << YShift} " +
      s"+ CAST(least(greatest(floor(($lonExpr + 18e1) / 36e1 * $nLit), 0e0), $nm1) AS BIGINT))"
  }
}
