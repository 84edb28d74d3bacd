package graft

import graft.functions.S2

/** SQL builders for the DuckDB oracle queries.
  *
  * Every fragment here is the *textual twin* of a Column expression in
  * graft.functions / graft.operators: identical operation order and
  * associativity, numeric literals in e-notation (so DuckDB types them
  * DOUBLE, matching Spark), and no rounding of exact rationals (Spark
  * `bround` is half-even, DuckDB `round` is half-away — they only agree on
  * values that are never exact decimal ties, i.e. transcendental-derived
  * ones). Integer seconds use epoch_us//1000000 (DuckDB's CAST(double AS
  * BIGINT) rounds where Spark truncates).
  */
object OracleSql {

  /** radians(x) as Java Math.toRadians computes it: (x / 180.0) * PI. */
  def rad(x: String): String = s"(($x) / 18e1 * pi())"

  /** Twin of Geo.haversineMeters (same associativity). */
  def hav(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val s1 = s"sin((${rad(lat2)} - ${rad(lat1)}) / 2e0)"
    val s2 = s"sin((${rad(lon2)} - ${rad(lon1)}) / 2e0)"
    val a  = s"($s1 * $s1 + cos(${rad(lat1)}) * cos(${rad(lat2)}) * ($s2 * $s2))"
    s"(atan2(sqrt($a), sqrt(1e0 - $a)) * 2e0 * 6371000e0)"
  }

  /** Twin of Geo.euclidDeg2. */
  def euclid2(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"((($lat1) - ($lat2)) * (($lat1) - ($lat2)) + (($lon1) - ($lon2)) * (($lon1) - ($lon2)))"

  /** Twin of Spatial.rayCast: crossing-number sum over literal edges. */
  def rayCastSql(lat: String, lon: String, verts: Seq[(Double, Double)]): String = {
    val edges = verts.zip(verts.tail :+ verts.head)
    val terms = edges.map { case ((y1, x1), (y2, x2)) =>
      val xCross = s"(${x1}e0 + ($lat - ${y1}e0) / (${y2}e0 - ${y1}e0) * (${x2}e0 - ${x1}e0))"
      s"(CASE WHEN ((${y1}e0 > $lat) <> (${y2}e0 > $lat)) AND $lon < $xCross THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** Per-user home/work site coordinates (twin of Pipelines). */
  val hlat = "(4e1 + CAST(user_id % 5 AS DOUBLE) * 1e-2)"
  val hlon = "(-75e0 + CAST(user_id % 3 AS DOUBLE) * 1e-2)"
  val wlat = s"($hlat + 4e-3)"
  val wlon = s"($hlon + 4e-3)"

  /** Twin of Weather.quantileNearest: nearest-interpolation percentile with
    * numpy's round-half-even index ties, over a DuckDB list expression.
    * `q` must be a binary-exact fraction string like "0.25".
    */
  def qNearestSql(listExpr: String, q: String): String = {
    val pos = s"(${q}e0 * CAST(len($listExpr) - 1 AS DOUBLE))"
    val r   = s"floor($pos)"
    val idx = s"(CASE WHEN ($pos - $r) > 0.5e0 THEN $r + 1e0" +
      s" WHEN ($pos - $r) < 0.5e0 THEN $r" +
      s" ELSE (CASE WHEN $r % 2e0 = 0e0 THEN $r ELSE $r + 1e0 END) END)"
    s"(CASE WHEN len($listExpr) > 0 THEN list_sort($listExpr)[CAST($idx AS BIGINT) + 1] END)"
  }

  /** The GPS stream CTE (twin of Tables.gps). */
  val gpsCte: String = graft.sources.Tables.gpsCte.stripPrefix("WITH ")

  /** Twin of Docs.md5Long applied to a PRE-COMPUTED md5 hex string `hx`:
    * first 15 hex chars parsed base-16 as exact BIGINT arithmetic (DuckDB
    * has no conv(); 16^14 exceeds exact DOUBLE so every power is a BIGINT
    * literal). `hx` should be a cheap reference (a lambda variable or CTE
    * column) — it is referenced 15 times.
    */
  def hexToLongSql(hx: String): String =
    (0 until 15).map { k =>
      val pow = java.math.BigInteger.valueOf(16).pow(14 - k).longValueExact()
      s"(CAST(strpos('0123456789abcdef', substr($hx, ${k + 1}, 1)) AS BIGINT) - 1) * $pow"
    }.mkString("(", " + ", ")")

  /** CTE chain computing the S2 cell id of ($latE, $lonE) at `level` for
    * every row of `srcRel` — the textual twin of S2.cellId, same operation
    * order throughout: radians as (x/18e1*pi()), xyz products, dominant-axis
    * face CASE with >= ties, gnomonic uv division table, quadratic √ ST,
    * floor-then-clamp ij, then the Hilbert position as a per-level state
    * chain (state = n·4+orientation; state' = (state//4)·16 + combo[key],
    * combo = S2.Combo) seeded with face·4 + face&1. The final id applies the
    * face≥4 two's-complement correction BEFORE the shift multiply so DuckDB
    * (which errors on BIGINT overflow rather than wrapping) produces the
    * identical signed 64-bit value as the JVM's wrapping shift.
    *
    * Emits relation `$p` = all `srcRel` columns + `${p}_cell` (BIGINT);
    * intermediates are EXCLUDEd. Column names are `$p`-prefixed to avoid
    * collisions; pick a distinct prefix per chain in one query.
    */
  def s2CellCtes(srcRel: String, latE: String, lonE: String, level: Int, p: String): String = {
    require(level >= 1 && level <= 30)
    val n = 1L << level
    val phi = s"(($latE) / 18e1 * pi())"
    val th = s"(($lonE) / 18e1 * pi())"
    def st(c: String) =
      s"(CASE WHEN $c >= 0e0 THEN 0.5e0 * sqrt(1e0 + 3e0 * $c) ELSE 1e0 - 0.5e0 * sqrt(1e0 - 3e0 * $c) END)"
    def ij(c: String) =
      s"CAST(least(greatest(floor(${st(c)} * ${n}e0), 0e0), ${n - 1}e0) AS BIGINT)"
    val comboCase = (key: String) =>
      "(CASE " + key + S2.Combo.zipWithIndex.map { case (c, k) => s" WHEN $k THEN $c" }.mkString + " END)"
    // AS MATERIALIZED is load-bearing: each level references the previous
    // state twice (n = s//4 and orientation = s%4), and DuckDB's projection
    // merging would otherwise textually substitute the state expression —
    // 2^level blowup that stalls the optimizer from ~level 12 up
    val levelCtes = (0 until level).map { m =>
      val twoK = 1L << (level - 1 - m)
      val key = s"((${p}_s$m % 4) * 4 + ((${p}_i // $twoK) % 2) * 2 + ((${p}_j // $twoK) % 2))"
      s"""${p}_h${m + 1} AS MATERIALIZED (
         |  SELECT *, (${p}_s$m // 4) * 16 + ${comboCase(key)} AS ${p}_s${m + 1} FROM ${p}_h$m
         |)""".stripMargin
    }.mkString(",\n")
    val shift = 2 * (30 - level)
    val faceFix = s"(CASE WHEN ${p}_face >= 4 THEN ${8L * (1L << (2 * level))} ELSE CAST(0 AS BIGINT) END)"
    val idExpr = s"(((${p}_s$level // 4) - $faceFix) * ${1L << (shift + 1)} + ${1L << shift})"
    val exclude = (Seq("x", "y", "z", "face", "u", "v", "i", "j") ++ (0 to level).map(m => s"s$m"))
      .map(c => s"${p}_$c").mkString(", ")
    s"""${p}_xyz AS (
       |  SELECT *,
       |    cos($phi) * cos($th) AS ${p}_x,
       |    cos($phi) * sin($th) AS ${p}_y,
       |    sin($phi) AS ${p}_z
       |  FROM $srcRel
       |),
       |${p}_fuv AS (
       |  SELECT *,
       |    CASE WHEN abs(${p}_x) >= abs(${p}_y) AND abs(${p}_x) >= abs(${p}_z)
       |           THEN (CASE WHEN ${p}_x >= 0e0 THEN 0 ELSE 3 END)
       |         WHEN abs(${p}_y) >= abs(${p}_z) THEN (CASE WHEN ${p}_y >= 0e0 THEN 1 ELSE 4 END)
       |         ELSE (CASE WHEN ${p}_z >= 0e0 THEN 2 ELSE 5 END) END AS ${p}_face
       |  FROM ${p}_xyz
       |),
       |${p}_uv AS (
       |  SELECT *,
       |    CASE ${p}_face WHEN 0 THEN ${p}_y / ${p}_x WHEN 1 THEN -${p}_x / ${p}_y
       |                   WHEN 2 THEN -${p}_x / ${p}_z WHEN 3 THEN ${p}_z / ${p}_x
       |                   WHEN 4 THEN ${p}_z / ${p}_y ELSE -${p}_y / ${p}_z END AS ${p}_u,
       |    CASE ${p}_face WHEN 0 THEN ${p}_z / ${p}_x WHEN 1 THEN ${p}_z / ${p}_y
       |                   WHEN 2 THEN -${p}_y / ${p}_z WHEN 3 THEN ${p}_y / ${p}_x
       |                   WHEN 4 THEN -${p}_x / ${p}_y ELSE -${p}_x / ${p}_z END AS ${p}_v
       |  FROM ${p}_fuv
       |),
       |${p}_h0 AS MATERIALIZED (
       |  SELECT *, ${ij(s"${p}_u")} AS ${p}_i, ${ij(s"${p}_v")} AS ${p}_j,
       |    CAST(${p}_face * 4 + (${p}_face % 2) AS BIGINT) AS ${p}_s0
       |  FROM ${p}_uv
       |),
       |$levelCtes,
       |$p AS (
       |  SELECT * EXCLUDE ($exclude), $idExpr AS ${p}_cell FROM ${p}_h$level
       |)""".stripMargin
  }

  /** Pages CTEs (twin of ingest.Pages.pagesFromGps + extractText): emits
    * `ptext(url, warc_ts, lang, text)`. DuckDB regexp_replace needs the 'g'
    * flag to match Spark's replace-all semantics; patterns restricted to the
    * Java-regex ∩ RE2 subset.
    */
  val pagesCtes: String = {
    val place  = "'place_' || CAST(pg_cell AS VARCHAR)"
    val latu   = "CAST(round(lat * 1e6, 0) AS BIGINT)"
    val lonu   = "CAST(round(lon * 1e6, 0) AS BIGINT)"
    val html   =
      s"""'<html><head><title>' || $place || '</title>' ||
         |      '<style>body { color: red; }</style></head><body>' || chr(10) ||
         |      '  <h1>Field report</h1>' || chr(10) ||
         |      '  <p>Observed near <a href="/p?q=1&amp;r=2">' || $place ||
         |      '</a> at loc:' || CAST($latu AS VARCHAR) || ',' || CAST($lonu AS VARCHAR) ||
         |      '.</p>' || chr(10) || '  <script>var tracking = "<p>";</script>' || chr(10) ||
         |      '</body></html>'""".stripMargin
    s"""${s2CellCtes("gps", "lat", "lon", 10, "pg")},
       |pages AS (
       |  SELECT 'https://example.org/' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id AS VARCHAR) AS url,
       |    ts AS warc_ts,
       |    CASE WHEN event_id % 17 = 0 THEN 'de' WHEN event_id % 23 = 0 THEN 'fr' ELSE 'en' END AS lang,
       |    $html AS html_s
       |  FROM pg
       |),
       |ptext AS (
       |  SELECT url, warc_ts, lang,
       |    trim(regexp_replace(
       |      replace(replace(replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(html_s, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
       |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
       |          '<[^>]*>', ' ', 'g'),
       |        '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
       |      '\\s+', ' ', 'g')) AS text
       |  FROM pages
       |)""".stripMargin
  }

  /** Velocity pipeline CTEs (twin of Motion.processVelocities): emits
    * relation `vel(user_id, event_id, ts, lat, lon, binning, displacement,
    * time_delta, velocity)`.
    */
  val velCtes: String = {
    val meters = hav("plat", "plon", "lat", "lon")
    s"""lagged AS (
       |  SELECT user_id, event_id, ts, lat, lon,
       |         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon, lag(ts) OVER w AS pts
       |  FROM gps WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |),
       |met AS (
       |  SELECT *, $meters AS meters,
       |         (abs(epoch_us(ts) - epoch_us(pts)) // 1000000) % 86400 AS secs
       |  FROM lagged
       |),
       |binr AS (
       |  SELECT *, CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END AS vraw,
       |    CASE WHEN meters >= 0e0 AND meters < 4.9e0 THEN 'stationary'
       |         WHEN (CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END) > 0e0
       |              AND (CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END) < 0.7e0 THEN 'stationary'
       |         WHEN (CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END) < 1.5e0 THEN 'walking'
       |         WHEN (CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END) < 5.9e0 THEN 'active'
       |         WHEN (CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END) < 67.056e0 THEN 'powered_vehicle'
       |         WHEN (CASE WHEN secs <> 0 THEN meters / CAST(secs AS DOUBLE) END) < 312.928e0 THEN 'high_speed_transportation'
       |         ELSE 'anomaly' END AS rawbin
       |  FROM met
       |),
       |velg AS (
       |  SELECT *, CASE WHEN pts IS NULL THEN 'null'
       |                 WHEN secs > 64800 THEN 'null'
       |                 WHEN rawbin = 'active' AND secs > 43200 THEN 'null'
       |                 ELSE rawbin END AS binning
       |  FROM binr
       |),
       |vel AS (
       |  SELECT user_id, event_id, ts, lat, lon, binning,
       |    CASE WHEN binning NOT IN ('null', 'anomaly') THEN round(meters, 1) END AS displacement,
       |    CASE WHEN binning NOT IN ('null', 'anomaly') THEN secs END AS time_delta,
       |    CASE WHEN binning NOT IN ('null', 'anomaly') THEN round(vraw, 3) END AS velocity
       |  FROM velg
       |)""".stripMargin
  }

  /** Gap-imputation CTEs (twin of Motion.imputeStationary, reference
    * gscap/gps.py:1611-1746): emits `imputed(user_id, event_id, ts, lat,
    * lon)` — the endpoint-exclusive 600 s fill rows with np.linspace
    * interpolation (identical operation order: prev + (cur−prev) ·
    * (pos/(n_fill−1)), degenerate n_fill=1 → prev). pos is recovered from
    * the fill timestamp ((fill−start)//600), the exact posexplode index.
    */
  val imputeCtes: String = {
    val meters = hav("plat", "plon", "lat", "lon")
    val vraw   = "(CASE WHEN secsmod <> 0 THEN meters / CAST(secsmod AS DOUBLE) END)"
    val posd   = "CAST((fill_sec - (psec + 600)) // 600 AS DOUBLE)"
    val fracd  = s"($posd / CAST(n_fill - 1 AS DOUBLE))"
    s"""ilag AS (
       |  SELECT user_id, event_id, ts, lat, lon,
       |    lag(lat) OVER w AS plat, lag(lon) OVER w AS plon, lag(ts) OVER w AS pts
       |  FROM gps WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |),
       |imet AS (
       |  SELECT *, $meters AS meters,
       |    abs(epoch_us(ts) // 1000000 - epoch_us(pts) // 1000000) % 86400 AS secsmod,
       |    epoch_us(ts) // 1000000 - epoch_us(pts) // 1000000 AS gapsec,
       |    epoch_us(pts) // 1000000 AS psec,
       |    epoch_us(ts) // 1000000 AS csec
       |  FROM ilag
       |),
       |ielig AS (
       |  SELECT * FROM imet
       |  WHERE pts IS NOT NULL
       |    AND ((meters >= 0e0 AND meters < 4.9e0)
       |         OR ($vraw > 0e0 AND $vraw < 0.7e0))
       |    AND round(meters, 1) <= 75e0
       |    AND secsmod <= 43200
       |    AND gapsec > 600
       |),
       |ifill AS (
       |  SELECT user_id, plat, plon, lat AS clat, lon AS clon, psec, csec,
       |    unnest(generate_series(psec + 600, csec - 1, 600)) AS fill_sec,
       |    (csec - 1 - (psec + 600)) // 600 + 1 AS n_fill
       |  FROM ielig
       |),
       |imputed AS (
       |  SELECT user_id, CAST(-1 AS BIGINT) AS event_id,
       |    make_timestamp(fill_sec * 1000000) AS ts,
       |    CASE WHEN n_fill = 1 THEN plat
       |         ELSE plat + (clat - plat) * $fracd END AS lat,
       |    CASE WHEN n_fill = 1 THEN plon
       |         ELSE plon + (clon - plon) * $fracd END AS lon
       |  FROM ifill
       |)""".stripMargin
  }

  /** Labeled-points CTE (twin of Pipelines.labeledPoints): adds date, the
    * level-16 S2 cell, cid ∈ {home, work, x<cell>} via 500 m haversine
    * fences to the per-user home/work sites.
    */
  val labCtes: String =
    s"""$gpsCte,
       |$velCtes,
       |${s2CellCtes("vel", "lat", "lon", 16, "g16")},
       |lab AS (
       |  SELECT * EXCLUDE (g16_cell), CAST(ts AS DATE) AS "date",
       |    CASE WHEN ${hav(hlat, hlon, "lat", "lon")} <= 5e2 THEN 'home'
       |         WHEN ${hav(wlat, wlon, "lat", "lon")} <= 5e2 THEN 'work'
       |         ELSE 'x' || CAST(g16_cell AS VARCHAR) END AS cid
       |  FROM g16
       |)""".stripMargin

  /** Sessionized visits CTEs (twin of Sessions.visits over labeled points):
    * emits `visits(user_id, date, pos, cid, time_in, time_out, n_points,
    * duration, midpoint)`.
    */
  val visitCtes: String =
    s"""$labCtes,
       |chg AS (
       |  SELECT *, CASE WHEN lag(cid) OVER w IS DISTINCT FROM cid THEN 1 ELSE 0 END AS is_chg
       |  FROM lab WHERE binning = 'stationary'
       |  WINDOW w AS (PARTITION BY user_id, "date" ORDER BY ts, event_id)
       |),
       |pos_t AS (
       |  SELECT *, CAST(sum(is_chg) OVER (PARTITION BY user_id, "date" ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos
       |  FROM chg
       |),
       |collapsed AS (
       |  SELECT user_id, "date", pos, cid,
       |         min(ts) AS time_in, max(ts) AS time_out, count(*) AS n_points,
       |         quantile_cont(lat, 0.5e0) AS lat, quantile_cont(lon, 0.5e0) AS lon
       |  FROM pos_t GROUP BY user_id, "date", pos, cid
       |),
       |merged AS (
       |  SELECT user_id, "date", pos, cid, n_points, lat, lon,
       |    CASE WHEN pos = 1 AND lag(cid) OVER w2 = cid AND lag("date") OVER w2 = "date" - 1
       |         THEN CAST("date" AS TIMESTAMP) ELSE time_in END AS time_in,
       |    CASE WHEN lead(pos) OVER w2 = 1 AND lead(cid) OVER w2 = cid AND lead("date") OVER w2 = "date" + 1
       |         THEN CAST("date" AS TIMESTAMP) + INTERVAL 23 HOUR + INTERVAL 59 MINUTE + INTERVAL 59 SECOND
       |         ELSE time_out END AS time_out
       |  FROM collapsed WINDOW w2 AS (PARTITION BY user_id ORDER BY "date", pos)
       |),
       |durs AS (
       |  SELECT *, (CASE WHEN du - (du // 1000000) * 1000000 > 500000 THEN du // 1000000 + 1
       |                  WHEN du - (du // 1000000) * 1000000 < 500000 THEN du // 1000000
       |                  ELSE (CASE WHEN (du // 1000000) % 2 = 0 THEN du // 1000000 ELSE du // 1000000 + 1 END)
       |             END) AS duration
       |  FROM (SELECT *, epoch_us(time_out) - epoch_us(time_in) AS du FROM merged) t
       |),
       |visits AS (
       |  SELECT *, make_timestamp(
       |    (CASE WHEN mu - (mu // 1000000) * 1000000 > 500000 THEN mu // 1000000 + 1
       |          WHEN mu - (mu // 1000000) * 1000000 < 500000 THEN mu // 1000000
       |          ELSE (CASE WHEN (mu // 1000000) % 2 = 0 THEN mu // 1000000 ELSE mu // 1000000 + 1 END)
       |     END) * 1000000) AS midpoint
       |  FROM (SELECT *, epoch_us(time_in) + duration * 500000 AS mu FROM durs) t
       |)""".stripMargin

  // -----------------------------------------------------------------------
  // Exact-oracle twins for the document-hash and ANN probe mechanics
  // -----------------------------------------------------------------------

  /** Left fold Σx over a DuckDB list expression with init 0.0 — the textual
    * twin of Spark's `aggregate(xs, lit(0.0), acc + x)`: list_reduce is a
    * sequential fold, so the additions associate identically and the result
    * is bit-for-bit the same double.
    */
  def foldSumSql(items: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $items), (acc, x) -> acc + x)"

  /** Twin of Similarity.dot(emb, literal array) — products in index order,
    * then the left-fold sum. `bLit` must be a DuckDB list literal.
    */
  def dotLitSql(a: String, bLit: String): String =
    foldSumSql(s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * ($bLit)[i])")

  /** Twin of Similarity.l2Norm's inner sum (squares in order, left fold). */
  def normSqSql(a: String): String =
    foldSumSql(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")

  /** Twin of the emb_pq_fixed query: per-subvector squared-L2 argmin
    * against literal integer codebooks (ties → LOWEST centroid index,
    * matching Spark's array_min over struct(d, c)), the packed Σ cⱼ·kʲ
    * code, and the Σ least(dⱼ…) reconstruction error in the same
    * left-to-right order. Every distance is ‖v‖² − 2·v·c + ‖c‖² with the
    * same fold order as the compiled kernels, so the doubles match
    * bit-for-bit.
    */
  def embPqFixedSql(books: Seq[Seq[Seq[Double]]], k: Int, subDim: Int): String = {
    val m = books.size
    def centLit(v: Seq[Double]): String =
      v.map(x => s"${x.toLong}e0").mkString("[", ", ", "]")
    val dCols = (for { j <- 0 until m; c <- 0 until k } yield {
      val sub = s"list_slice(embedding, ${j * subDim + 1}, ${(j + 1) * subDim})"
      val v = books(j)(c)
      val ssq = v.map(x => x * x).sum.toLong // exact: small integers
      s"    (${normSqSql(sub)} - 2e0 * ${dotLitSql(sub, centLit(v))} + ${ssq}e0) AS d_${j}_$c"
    }).mkString(",\n")
    def codeCase(j: Int): String = {
      val whens = (0 until k - 1).map { c =>
        val rest = (c + 1 until k).map(i => s"d_${j}_$i").mkString(", ")
        s"WHEN d_${j}_$c <= least($rest) THEN $c"
      }.mkString(" ")
      s"CASE $whens ELSE ${k - 1} END"
    }
    val codeExpr = (0 until m)
      .map(j => s"(${codeCase(j)}) * ${math.pow(k, j).toLong}").mkString(" + ")
    val errExpr = (0 until m)
      .map(j => s"least(${(0 until k).map(c => s"d_${j}_$c").mkString(", ")})")
      .mkString(" + ")
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id,
       |$dCols
       |  FROM embeddings
       |)
       |SELECT vec_id, CAST($codeExpr AS BIGINT) AS pq_code, ($errExpr) AS err
       |FROM d""".stripMargin
  }

  /** Twin of the emb_pq_adc query: ADC search over the emb_pq_fixed codes
    * — the codes CTE is the encode twin verbatim, the query side picks the
    * per-subspace distance by the same (code >> 2j) & 3 digit, and rank
    * mirrors row_number over (adc ASC, vec_id).
    */
  def embPqAdcSql(books: Seq[Seq[Seq[Double]]], k: Int, subDim: Int,
                  queryMod: Int): String = {
    val m = books.size
    def centLit(v: Seq[Double]): String =
      v.map(x => s"${x.toLong}e0").mkString("[", ", ", "]")
    val adcExpr = (0 until m).map { j =>
      val sub = s"list_slice(q.q_emb, ${j * subDim + 1}, ${(j + 1) * subDim})"
      val cases = (0 until 4).map { c =>
        val v = books(j)(c)
        val ssq = v.map(x => x * x).sum.toLong
        s"WHEN ((c.pq_code >> ${2 * j}) & 3) = $c THEN " +
          s"(${normSqSql(sub)} - 2e0 * ${dotLitSql(sub, centLit(v))} + ${ssq}e0)"
      }.mkString(" ")
      s"(CASE $cases END)"
    }.mkString(" + ")
    s"""WITH codes AS MATERIALIZED (
       |${embPqFixedSql(books, 4, subDim).linesIterator.map("  " + _).mkString("\n")}
       |),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id % $queryMod = 0),
       |pairs AS (
       |  SELECT q.query_id, c.vec_id, ($adcExpr) AS adc
       |  FROM q, codes c WHERE c.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rank
       |  FROM pairs) t WHERE rank <= $k""".stripMargin
  }

  /** Twin of the emb_ivf_fixed query: the full IVF pipeline — argmax cell
    * assignment against a literal integer codebook (ties → higher cell id,
    * matching Spark's array_max over struct(s, c)), per-query top-`nProbe`
    * probe cells (ties → higher id, matching reverse(array_sort)), exact
    * cosine rerank inside probed cells, rank = row_number by (cosine DESC,
    * vec_id). Centroid norms are exact integers so sqrt is identical on
    * both engines; vector sums share Spark's fold order via list_reduce.
    */
  def embIvfFixedSql(codebook: Seq[(Int, Seq[Double])], nProbe: Int, k: Int,
                     queryMod: Int): String = {
    val n = codebook.size
    def centLit(v: Seq[Double]): String =
      v.map(x => s"${x.toLong}e0").mkString("[", ", ", "]")
    def cosLit(e: String, v: Seq[Double]): String = {
      val ss = v.map(x => x * x).sum.toLong // exact: small integers
      s"(${dotLitSql(e, centLit(v))} / (sqrt(${normSqSql(e)}) * sqrt(${ss}e0)))"
    }
    val sCols = codebook.map { case (c, v) =>
      s"    ${cosLit("embedding", v)} AS s$c" }.mkString(",\n")
    // highest index wins ties, same as array_max over struct(s, c)
    val cellCase = (n - 1).to(1, -1).map { c =>
      val others = (0 until c).map(i => s"s$i").mkString(", ")
      val ge = if (c == 1) s"s1 >= s0" else s"s$c >= greatest($others)"
      s"WHEN $ge THEN $c"
    }.mkString(" ") + " ELSE 0"
    val qflat = (0 until n).map(c =>
      s"  SELECT query_id, q_emb, $c AS c, s$c AS s FROM qs").mkString("\n  UNION ALL\n")
    val qcos =
      s"(${foldSumSql("list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.q_emb[i] AS DOUBLE))")} " +
        s"/ (sqrt(${normSqSql("e.embedding")}) * sqrt(${normSqSql("p.q_emb")})))"
    s"""WITH sc AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |$sCols
       |  FROM embeddings
       |),
       |cells AS (
       |  SELECT vec_id, embedding, CASE $cellCase END AS ivf_cell FROM sc
       |),
       |qs AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, ${codebook.map(c => s"s${c._1}").mkString(", ")}
       |  FROM sc WHERE vec_id % $queryMod = 0
       |),
       |qflat AS (
       |$qflat
       |),
       |probes AS (
       |  SELECT query_id, q_emb, c AS ivf_cell FROM (
       |    SELECT query_id, q_emb, c,
       |      row_number() OVER (PARTITION BY query_id ORDER BY s DESC, c DESC) AS rn
       |    FROM qflat) t WHERE rn <= $nProbe
       |),
       |cand AS (
       |  SELECT p.query_id, e.vec_id, $qcos AS cosine
       |  FROM probes p JOIN cells e ON p.ivf_cell = e.ivf_cell
       |  WHERE e.vec_id <> p.query_id
       |)
       |SELECT query_id, vec_id, rank FROM (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM cand) t WHERE rank <= $k""".stripMargin
  }

  /** Twin of the dbscan_distributed query — possible because every
    * DistributedDbscan tie-break is canonical (min-uid component ids,
    * min-comp border attach, min-uid label ranking), so the whole pipeline
    * is order-independent and SQL-expressible:
    * coordinate dedup with multiplicities → 3×3 eps-cell neighbor pairs
    * (self-pair included, matching the weighted degree that counts self) →
    * weighted-degree core flags → connected components over core-core
    * eps-edges via a recursive min-label walk (labels only propagate
    * downhill: `w.comp < e.a_uid` prunes without changing min) → border =
    * min core-neighbor component → dense labels in component-min-uid order
    * → per-label summary. `epsLit` must be an e-notation literal parsing to
    * the same double Spark uses (5e-3 ≡ 0.005).
    */
  def dbscanSummarySql(epsLit: String, minSamples: Int): String =
    s"""WITH RECURSIVE $gpsCte,
       |pts AS (SELECT event_id AS id, lat, lon FROM gps),
       |uniq AS MATERIALIZED (
       |  SELECT lat, lon, min(id) AS uid, count(*) AS w,
       |    CAST(floor(lat / $epsLit) AS BIGINT) AS cy,
       |    CAST(floor(lon / $epsLit) AS BIGINT) AS cx
       |  FROM pts GROUP BY lat, lon
       |),
       |offs AS (SELECT dy.d AS dy, dx.d AS dx FROM (VALUES (-1), (0), (1)) dy(d), (VALUES (-1), (0), (1)) dx(d)),
       |pairs AS MATERIALIZED (
       |  SELECT a.uid AS a_uid, b.uid AS b_uid, b.w AS b_w
       |  FROM uniq a JOIN offs o ON true
       |  JOIN uniq b ON b.cy = a.cy + o.dy AND b.cx = a.cx + o.dx
       |  WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) <= ($epsLit * $epsLit)
       |),
       |core AS MATERIALIZED (
       |  SELECT a_uid AS uid FROM pairs GROUP BY a_uid HAVING sum(b_w) >= $minSamples
       |),
       |edges AS MATERIALIZED (
       |  SELECT p.a_uid, p.b_uid FROM pairs p
       |  JOIN core c1 ON p.a_uid = c1.uid
       |  JOIN core c2 ON p.b_uid = c2.uid
       |  WHERE p.a_uid <> p.b_uid
       |),
       |walk AS (
       |  SELECT uid, uid AS comp FROM core
       |  UNION
       |  SELECT e.a_uid AS uid, w.comp FROM edges e JOIN walk w ON w.uid = e.b_uid
       |  WHERE w.comp < e.a_uid
       |),
       |comp AS MATERIALIZED (SELECT uid, min(comp) AS comp FROM walk GROUP BY uid),
       |border AS (
       |  SELECT p.a_uid AS uid, min(c.comp) AS comp
       |  FROM pairs p
       |  JOIN comp c ON p.b_uid = c.uid
       |  LEFT JOIN core k ON p.a_uid = k.uid
       |  WHERE k.uid IS NULL
       |  GROUP BY p.a_uid
       |),
       |assigned AS MATERIALIZED (
       |  SELECT uid, comp FROM comp UNION ALL SELECT uid, comp FROM border
       |),
       |ranked AS MATERIALIZED (
       |  SELECT comp, CAST(row_number() OVER (ORDER BY cmin) - 1 AS BIGINT) AS label
       |  FROM (SELECT comp, min(uid) AS cmin FROM assigned GROUP BY comp) t
       |),
       |coordlab AS MATERIALIZED (
       |  SELECT u.lat, u.lon, coalesce(ar.label, -1) AS label
       |  FROM uniq u
       |  LEFT JOIN (SELECT a.uid, r.label FROM assigned a JOIN ranked r ON a.comp = r.comp) ar
       |    ON u.uid = ar.uid
       |)
       |SELECT c.label, count(*) AS n_points, min(p.id) AS min_id, max(p.id) AS max_id,
       |  CAST(sum(p.id) AS BIGINT) AS id_sum,
       |  round(avg(p.lat), 4) AS centroid_lat, round(avg(p.lon), 4) AS centroid_lon
       |FROM pts p JOIN coordlab c ON p.lat = c.lat AND p.lon = c.lon
       |GROUP BY c.label""".stripMargin

  /** Twin of the gps_user_dbscan query — [[dbscanSummarySql]] partitioned
    * per user and restricted to CORE points. Why this is exact where full
    * per-user sklearn labels are not: border labels depend on cluster scan
    * order, but core membership is a canonical partition, and with input
    * sorted by event_id sklearn numbers clusters in first-core-seed order —
    * i.e. label = rank of the cluster's minimum core uid (uid = min
    * event_id per coordinate; event_ids are globally unique, so the
    * recursive walk can join on uid alone while edges stay within-user).
    */
  def userDbscanSql(epsLit: String, minSamples: Int): String =
    s"""WITH RECURSIVE ${userDbscanCoreCtes(epsLit, minSamples)}
       |SELECT l.user_id, l.label, count(*) AS n_core,
       |  min(p.id) AS min_id, max(p.id) AS max_id, CAST(sum(p.id) AS BIGINT) AS id_sum,
       |  min(p.lat) AS lat_min, max(p.lat) AS lat_max,
       |  min(p.lon) AS lon_min, max(p.lon) AS lon_max
       |FROM pts p JOIN corelab l ON p.user_id = l.user_id AND p.lat = l.lat AND p.lon = l.lon
       |GROUP BY l.user_id, l.label""".stripMargin

  /** The per-user-DBSCAN core-labeling CTE chain shared by
    * [[userDbscanSql]] and [[userDbscanStatsSql]]: grid-cell half-ring
    * neighbor pairs → weighted core test → core-core edges → recursive
    * downhill min-label walk → label = rank of each cluster's min core uid
    * → `corelab(user_id, lat, lon, label)` (plus `pts` with every original
    * row). Callers prepend WITH RECURSIVE and append their final SELECT.
    */
  def userDbscanCoreCtes(epsLit: String, minSamples: Int): String =
    s"""$gpsCte,
       |pts AS (SELECT user_id, event_id AS id, lat, lon FROM gps),
       |uniq AS MATERIALIZED (
       |  SELECT user_id, lat, lon, min(id) AS uid, count(*) AS w,
       |    CAST(floor(lat / $epsLit) AS BIGINT) AS cy,
       |    CAST(floor(lon / $epsLit) AS BIGINT) AS cx
       |  FROM pts GROUP BY user_id, lat, lon
       |),
       |offs AS (SELECT dy.d AS dy, dx.d AS dx FROM (VALUES (-1), (0), (1)) dy(d), (VALUES (-1), (0), (1)) dx(d)),
       |pairs AS MATERIALIZED (
       |  SELECT a.user_id, a.uid AS a_uid, b.uid AS b_uid, b.w AS b_w
       |  FROM uniq a JOIN offs o ON true
       |  JOIN uniq b ON b.user_id = a.user_id AND b.cy = a.cy + o.dy AND b.cx = a.cx + o.dx
       |  WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) <= ($epsLit * $epsLit)
       |),
       |core AS MATERIALIZED (
       |  SELECT user_id, a_uid AS uid FROM pairs GROUP BY user_id, a_uid HAVING sum(b_w) >= $minSamples
       |),
       |edges AS MATERIALIZED (
       |  SELECT p.user_id, p.a_uid, p.b_uid FROM pairs p
       |  JOIN core c1 ON p.user_id = c1.user_id AND p.a_uid = c1.uid
       |  JOIN core c2 ON p.user_id = c2.user_id AND p.b_uid = c2.uid
       |  WHERE p.a_uid <> p.b_uid
       |),
       |walk AS (
       |  SELECT user_id, uid, uid AS comp FROM core
       |  UNION
       |  SELECT e.user_id, e.a_uid AS uid, w.comp FROM edges e JOIN walk w ON w.uid = e.b_uid
       |  WHERE w.comp < e.a_uid
       |),
       |comp AS MATERIALIZED (SELECT user_id, uid, min(comp) AS comp FROM walk GROUP BY user_id, uid),
       |ranked AS MATERIALIZED (
       |  SELECT user_id, comp, CAST(row_number() OVER (PARTITION BY user_id ORDER BY cmin) - 1 AS BIGINT) AS label
       |  FROM (SELECT user_id, comp, min(uid) AS cmin FROM comp GROUP BY user_id, comp) t
       |),
       |corelab AS MATERIALIZED (
       |  SELECT c.user_id, u.lat, u.lon, r.label
       |  FROM comp c
       |  JOIN ranked r ON c.user_id = r.user_id AND c.comp = r.comp
       |  JOIN uniq u ON c.user_id = u.user_id AND c.uid = u.uid
       |)""".stripMargin

  /** Twin of the gps_cluster_stats query: the reference's
    * extract_cluster_centers statistics (gps.py:1002-1067) per (user,
    * label) over CORE rows, every value cross-engine exact WITHOUT
    * rounding: sums/means fold over the SORTED coordinate list (canonical
    * order → bit-identical IEEE accumulation both engines, the
    * list_reduce/aggregate pairing from CLAUDE.md), the IQR keeps the
    * reference's percentile-FRACTION quirk (q/100 · (n−1) linear
    * interpolation), std is ddof=1 (NULL for n<2), and max_dist_m is an
    * order-independent max of haversines from the fold-mean center.
    */
  def userDbscanStatsSql(epsLit: String, minSamples: Int): String = {
    def foldSum(xs: String): String = foldSumSql(xs)
    def pctStage(s: String, q: String): (String, String, String) = {
      // (pos, lo, hi) column exprs over n_core
      (s"(($q) * CAST(n_core - 1 AS DOUBLE))",
        s"CAST(floor(pos_$s) AS BIGINT)",
        s"least(lo_$s + 1, n_core - 1)")
    }
    def interp(arr: String, s: String): String =
      s"($arr[CAST(lo_$s + 1 AS INT)] + ($arr[CAST(hi_$s + 1 AS INT)] - $arr[CAST(lo_$s + 1 AS INT)]) * (pos_$s - lo_$s))"
    val q25 = "(25e-2 / 100)"
    val q75 = "(75e-2 / 100)"
    val (posA, loA, hiA) = pctStage("a", q25)
    val (posB, loB, hiB) = pctStage("b", q75)
    s"""WITH RECURSIVE ${userDbscanCoreCtes(epsLit, minSamples)},
       |grp AS MATERIALIZED (
       |  SELECT l.user_id, l.label, p.lat, p.lon
       |  FROM pts p JOIN corelab l ON p.user_id = l.user_id AND p.lat = l.lat AND p.lon = l.lon
       |),
       |agg AS MATERIALIZED (
       |  SELECT user_id, label, count(*) AS n_core,
       |    min(lat) AS lat_min, max(lat) AS lat_max,
       |    min(lon) AS lon_min, max(lon) AS lon_max,
       |    list_sort(list(lat)) AS slat, list_sort(list(lon)) AS slon
       |  FROM grp GROUP BY user_id, label
       |),
       |pp AS MATERIALIZED (
       |  SELECT *, $posA AS pos_a, $posB AS pos_b FROM agg
       |),
       |pl AS MATERIALIZED (
       |  SELECT *, $loA AS lo_a, $loB AS lo_b FROM pp
       |),
       |ph AS MATERIALIZED (
       |  SELECT *, $hiA AS hi_a, $hiB AS hi_b FROM pl
       |),
       |mstats AS MATERIALIZED (
       |  SELECT user_id, label, n_core, lat_min, lat_max, lon_min, lon_max, slat, slon,
       |    ${foldSum("slat")} / n_core AS lat_mean,
       |    ${foldSum("slon")} / n_core AS lon_mean,
       |    (${interp("slat", "b")} - ${interp("slat", "a")}) AS lat_iqr,
       |    (${interp("slon", "b")} - ${interp("slon", "a")}) AS lon_iqr
       |  FROM ph
       |),
       |wstd AS MATERIALIZED (
       |  SELECT *,
       |    CASE WHEN n_core >= 2 THEN sqrt(${foldSum("list_transform(slat, v -> (v - lat_mean) * (v - lat_mean))")} / (n_core - 1)) END AS lat_std,
       |    CASE WHEN n_core >= 2 THEN sqrt(${foldSum("list_transform(slon, v -> (v - lon_mean) * (v - lon_mean))")} / (n_core - 1)) END AS lon_std
       |  FROM mstats
       |),
       |wdist AS (
       |  -- 3-dp rounding drowns JVM-vs-libm trig ulp noise at the
       |  -- fold-mean center (half-away ≡ Spark HALF_UP for positives;
       |  -- transcendental values cannot land on the boundary)
       |  SELECT m.user_id, m.label, round(max(${hav("g.lat", "g.lon", "m.lat_mean", "m.lon_mean")}), 3) AS max_dist_m
       |  FROM wstd m JOIN grp g ON g.user_id = m.user_id AND g.label = m.label
       |  GROUP BY m.user_id, m.label
       |)
       |SELECT w.user_id, w.label, w.n_core,
       |  w.lat_min, w.lat_max, w.lon_min, w.lon_max,
       |  w.lat_mean, w.lon_mean, w.lat_iqr, w.lon_iqr, w.lat_std, w.lon_std,
       |  d.max_dist_m
       |FROM wstd w JOIN wdist d ON w.user_id = d.user_id AND w.label = d.label""".stripMargin
  }

  /** Twin of the emb_lsh_fixed query: single-table hyperplane LSH over a
    * literal integer plane matrix — signature bits from exact-ordered dot
    * folds (disjoint bit values, SUM ≡ Spark's OR fold), bucket equi-join,
    * exact cosine rerank, rank by (cosine DESC, vec_id).
    */
  /** Sum-of-bit-CASE terms computing the integer-plane signature of the
    * `embedding` column (disjoint bit values, SUM ≡ Spark's OR fold).
    */
  def planeBitTermsSql(planes: Seq[Seq[Double]]): String = {
    def planeLit(v: Seq[Double]): String =
      v.map(x => s"${x.toLong}e0").mkString("[", ", ", "]")
    planes.zipWithIndex.map { case (p, b) =>
      s"    (CASE WHEN ${dotLitSql("embedding", planeLit(p))} > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" +\n")
  }

  def embLshFixedSql(planes: Seq[Seq[Double]], k: Int, queryMod: Int): String = {
    val bitTerms = planeBitTermsSql(planes)
    val qcos =
      s"(${foldSumSql("list_transform(range(1, len(s.embedding) + 1), i -> CAST(s.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))")} " +
        s"/ (sqrt(${normSqSql("s.embedding")}) * sqrt(${normSqSql("q.q_emb")})))"
    s"""WITH sig AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |$bitTerms AS bucket
       |  FROM embeddings
       |),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, bucket
       |  FROM sig WHERE vec_id % $queryMod = 0
       |),
       |cand AS (
       |  SELECT q.query_id, s.vec_id, $qcos AS cosine
       |  FROM q JOIN sig s ON q.bucket = s.bucket
       |  WHERE s.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, rank FROM (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM cand) t WHERE rank <= $k""".stripMargin
  }

  /** CTE chain of the md5-minhash banding twin (Docs.minHashMd5Signature +
    * the banding/bucket-cap stages of minHashMd5Candidates), ending at
    * `ok(doc_id, band_idx, band_hash)` — rows surviving the ≤100 bucket cap.
    * Shared by doc_minhash_md5 (pair listing) and doc_dedup_minhash
    * (connected-component cluster assignment).
    */
  val minHashMd5Ctes: String = {
    val h2l = hexToLongSql("h")
    val mhCols = (0 until 4).map { i =>
      s"""  coalesce(list_aggregate(list_transform(
         |    list_transform(s, x -> md5('$i|' || x)), h -> $h2l), 'min'),
         |    9223372036854775807) AS mh_$i""".stripMargin
    }.mkString(",\n")
    s"""toksd AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
       |),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(list_slice(t, i, i + 2), ' '))
       |      ELSE [] END) AS s
       |  FROM toksd
       |),
       |mh AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM sh
       |),
       |bnd AS (
       |  SELECT doc_id, 0 AS band_idx,
       |    md5(CAST(mh_0 AS VARCHAR) || ',' || CAST(mh_1 AS VARCHAR)) AS h FROM mh
       |  UNION ALL
       |  SELECT doc_id, 1 AS band_idx,
       |    md5(CAST(mh_2 AS VARCHAR) || ',' || CAST(mh_3 AS VARCHAR)) AS h FROM mh
       |),
       |bandsT AS (SELECT doc_id, band_idx, $h2l AS band_hash FROM bnd),
       |sizes AS (SELECT band_idx, band_hash, count(*) AS n FROM bandsT GROUP BY 1, 2),
       |ok AS (
       |  SELECT b.doc_id, b.band_idx, b.band_hash
       |  FROM bandsT b JOIN sizes s2 ON b.band_idx = s2.band_idx AND b.band_hash = s2.band_hash
       |  WHERE s2.n <= 100
       |)""".stripMargin
  }

  /** Candidate-pair listing over [[minHashMd5Ctes]]'s `ok` relation. */
  val minHashMd5PairsSelect: String =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
      |FROM ok a JOIN ok b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      |  AND a.doc_id < b.doc_id
      |GROUP BY 1, 2""".stripMargin

  /** Twin of the doc_dedup_minhash query: candidate pairs → connected
    * components (same recursive downhill min-label walk as
    * [[dbscanSummarySql]]) → per-cluster summary keyed by the min-doc_id
    * representative.
    */
  val minHashDedupSql: String =
    s"""WITH RECURSIVE $minHashMd5Ctes,
       |cand AS MATERIALIZED (
       |$minHashMd5PairsSelect
       |),
       |edgesd AS (
       |  SELECT doc_a AS a_uid, doc_b AS b_uid FROM cand
       |  UNION ALL SELECT doc_b AS a_uid, doc_a AS b_uid FROM cand
       |),
       |nodes AS (SELECT DISTINCT a_uid AS uid FROM edgesd),
       |walk AS (
       |  SELECT uid, uid AS comp FROM nodes
       |  UNION
       |  SELECT e.a_uid AS uid, w.comp FROM edgesd e JOIN walk w ON w.uid = e.b_uid
       |  WHERE w.comp < e.a_uid
       |),
       |compd AS (SELECT uid, min(comp) AS comp FROM walk GROUP BY uid)
       |SELECT comp AS rep, count(*) AS n_docs, max(uid) AS max_doc,
       |  CAST(sum(uid) AS BIGINT) AS id_sum
       |FROM compd GROUP BY comp""".stripMargin

  /** Twin of the emb_dedup query: embedding-cosine near-dup dedup — the
    * same integer-plane bucket prefilter as emb_lsh_fixed, an exact cosine
    * gate at `tauLit` (raw doubles, same fold order both engines), then the
    * recursive min-label component walk and a per-cluster summary keyed by
    * the minimum vec_id.
    */
  def embDedupSql(planes: Seq[Seq[Double]], tauLit: String): String = {
    val bitTerms = planeBitTermsSql(planes)
    val cos =
      s"(${foldSumSql("list_transform(range(1, len(a.embedding) + 1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))")} " +
        s"/ (sqrt(${normSqSql("a.embedding")}) * sqrt(${normSqSql("b.embedding")})))"
    s"""WITH RECURSIVE sig AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |$bitTerms AS bucket
       |  FROM embeddings
       |),
       |cand AS MATERIALIZED (
       |  SELECT a.vec_id AS a_v, b.vec_id AS b_v
       |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE $cos >= $tauLit
       |),
       |edgesd AS (
       |  SELECT a_v AS a_uid, b_v AS b_uid FROM cand
       |  UNION ALL SELECT b_v AS a_uid, a_v AS b_uid FROM cand
       |),
       |nodes AS (SELECT DISTINCT a_uid AS uid FROM edgesd),
       |walk AS (
       |  SELECT uid, uid AS comp FROM nodes
       |  UNION
       |  SELECT e.a_uid AS uid, w.comp FROM edgesd e JOIN walk w ON w.uid = e.b_uid
       |  WHERE w.comp < e.a_uid
       |),
       |compd AS (SELECT uid, min(comp) AS comp FROM walk GROUP BY uid)
       |SELECT comp AS rep, count(*) AS n_vecs, max(uid) AS max_vec
       |FROM compd GROUP BY comp""".stripMargin
  }

  /** Twin of Docs.simHashMd5: tokenize, md5Long per token occurrence,
    * per-bit ±1 sign sums over bits 0..59, pack positives (disjoint bit
    * values, so SUM ≡ the bitwise-OR fold Spark uses).
    */
  val simHashMd5Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents
       |),
       |mh AS MATERIALIZED (SELECT doc_id, md5(tok) AS hx FROM toks),
       |h AS (SELECT doc_id, ${hexToLongSql("hx")} AS hv FROM mh),
       |bits AS (
       |  SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c
       |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bs
       |  GROUP BY doc_id, b
       |)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash_md5
       |FROM bits GROUP BY doc_id""".stripMargin

  /** Twin of Docs.winnowSummary: k-char-gram md5Long hashes (md5 computed
    * once per gram via the nested transform), per-w-window minima, distinct
    * count + min/max summary. Short texts yield empty lists → n_fp 0 and
    * NULL min/max on both engines.
    */
  def winnowSql(k: Int, w: Int): String = {
    val h2l = hexToLongSql("h")
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(
       |        list_transform(range(1, length(text) - ${k - 2}), i -> md5(substring(text, i, $k))),
       |        h -> $h2l)
       |    ELSE [] END AS grams
       |  FROM documents
       |),
       |f AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN len(grams) >= $w THEN
       |      list_transform(range(1, len(grams) - ${w - 2}),
       |        j -> list_aggregate(list_slice(grams, j, j + ${w - 1}), 'min'))
       |    ELSE [] END AS fps
       |  FROM g
       |)
       |SELECT doc_id, CAST(len(list_distinct(fps)) AS BIGINT) AS n_fp,
       |  list_aggregate(fps, 'min') AS min_fp, list_aggregate(fps, 'max') AS max_fp
       |FROM f""".stripMargin
  }

  /** Twin of the media_pixels query: the DECODED pixel/sample aggregates of
    * the linear-content containers, recomputed ANALYTICALLY from the same
    * event_id arithmetic (never parsing bytes in SQL): channel value =
    * (sb + a·x + b·y) mod 256 summed over the w×h grid, PCM sample =
    * ((sb·97 + i·37) mod 65536) − 32768 over nf·ch samples. Equality with
    * Spark's decode-side sums verifies the real deflate→inflate→unfilter
    * and RIFF→LE-PCM kernels end-to-end. All sums cast from HUGEINT.
    */
  val mediaPixelsSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_id % 256 AS sb,
      |    CAST(event_id % 32 + 8 AS BIGINT) AS w,
      |    CAST(event_id % 24 + 8 AS BIGINT) AS h,
      |    CAST(event_id % 300 + 64 AS BIGINT) AS nf,
      |    CAST(CASE WHEN event_id % 6 = 0 THEN 1 ELSE 2 END AS BIGINT) AS ch
      |  FROM events WHERE event_id % 20 = 0
      |),
      |pngx AS (
      |  SELECT event_id, sb, h, unnest(generate_series(0, w - 1)) AS x
      |  FROM ev WHERE event_id % 3 <> 0
      |),
      |pngxy AS (
      |  SELECT event_id, sb, x, unnest(generate_series(0, h - 1)) AS y FROM pngx
      |),
      |png AS (
      |  SELECT event_id,
      |    CAST(sum((sb + x + 2 * y) % 256) AS BIGINT) AS sum_r,
      |    CAST(sum((sb + 3 * x + y) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum((sb + x + y) % 256) AS BIGINT) AS sum_b
      |  FROM pngxy GROUP BY event_id
      |),
      |wavi AS (
      |  SELECT event_id, sb, nf * ch AS n, unnest(generate_series(0, nf * ch - 1)) AS i
      |  FROM ev WHERE event_id % 3 = 0
      |),
      |wav AS (
      |  SELECT event_id, max(n) AS n_samples,
      |    CAST(sum(abs((sb * 97 + i * 37) % 65536 - 32768)) AS BIGINT) AS sum_abs,
      |    CAST(max(abs((sb * 97 + i * 37) % 65536 - 32768)) AS BIGINT) AS peak
      |  FROM wavi GROUP BY event_id
      |)
      |SELECT e.event_id,
      |  CASE WHEN e.event_id % 3 <> 0 THEN 'image/png' ELSE 'audio/wav' END AS media_kind,
      |  CASE WHEN e.event_id % 3 <> 0 THEN e.w END AS width,
      |  CASE WHEN e.event_id % 3 <> 0 THEN e.h END AS height,
      |  p.sum_r, p.sum_g, p.sum_b,
      |  CASE WHEN e.event_id % 3 <> 0 THEN 255 * e.w * e.h END AS sum_a,
      |  v.n_samples, v.sum_abs, v.peak
      |FROM ev e
      |LEFT JOIN png p ON e.event_id = p.event_id
      |LEFT JOIN wav v ON e.event_id = v.event_id""".stripMargin

  /** Twin of Docs.fingerprintMod: per-character base-31 polynomial rolling
    * hash mod 1e9+7, folded left-to-right (list_reduce with a prepended 0
    * init, exactly Spark's aggregate(chars, 0, pmod(acc·31 + c, p))).
    */
  val fingerprintModSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text) + 1),
      |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
      |    (a, x) -> (a * 31 + x) % 1000000007) AS fingerprint_mod
      |FROM documents""".stripMargin
}
