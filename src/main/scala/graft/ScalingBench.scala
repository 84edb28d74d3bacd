package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Grid
import graft.ingest.Pages
import graft.operators.Spatial
import graft.sources.Tables

/** Two-parallelism scaling evidence (north rule: throughput scaling
  * efficiency ≥0.8 from N to 4N executors; sandbox proxy = local[8] vs
  * local[32] on the same input, per BASELINE.md).
  *
  * The measured job is the headline pipeline: pages (synthesized, replicated
  * ×REPL for a meaningful runtime) → frozen text extraction → geocode →
  * grid-cell encode → broadcast point-in-polygon join → per-tile feature
  * aggregation. Reported metric: pages/sec at each parallelism + efficiency
  * = (T_small/T_big)/(big/small cores).
  *
  * Usage: runMain graft.ScalingBench [sfDir] [replication]
  */
object ScalingBench {

  def buildSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The headline job; returns the number of pages pushed through. */
  def runJob(spark: SparkSession, sfDir: String, repl: Int): Long = {
    // replicate the GPS stream deterministically to scale page volume
    // the toy source is a single small parquet file (1-2 input splits); a
    // 100 TB table arrives in thousands of row-group splits, so emulate that
    // here: spread the BASE stream across the slots BEFORE the replicating
    // explode (repartitioning afterwards would funnel the full replicated
    // volume through the 2 source tasks — a serial section)
    val gps = Tables.gps(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .withColumn("rep", explode(sequence(lit(0), lit(repl - 1))))
      .withColumn("event_id", col("event_id") * repl + col("rep"))
      .drop("rep")
    val pages = Pages.pagesFromGps(gps)
    val geo = Pages.geocode(pages)
      .withColumn("cell", Grid.cell(col("lat"), col("lon"), 13))
      .withColumn("tile_id", Grid.toParent(col("cell"), 13, 5))
    val rects = Tables.region(spark, sfDir).select(
      col("r_regionkey"),
      (lit(40.0) + col("r_regionkey").cast("double") * 1e-2 - 2e-3).as("lat_min"),
      (lit(40.0) + col("r_regionkey").cast("double") * 1e-2 + 6e-3).as("lat_max"),
      lit(-76.0).as("lon_min"), lit(-74.0).as("lon_max"))
    val joined = geo.join(broadcast(rects),
      col("lat") >= col("lat_min") && col("lat") < col("lat_max") &&
        col("lon") >= col("lon_min") && col("lon") < col("lon_max"), "left")
    // hot-key discipline: a naive countDistinct(url) funnels every row of a
    // hot tile into ONE final task (tiles are few and skewed — the exact
    // trap the north rule calls out). Two-stage form instead: distinct on
    // (keys, url) spreads by url hash; the per-tile count then combines
    // map-side partials.
    val stats = joined.groupBy("tile_id", "r_regionkey")
      .agg(count(lit(1)).as("n_pages"), avg(length(col("text"))).as("mean_chars"))
    val urls = joined.select("tile_id", "r_regionkey", "url").distinct()
      .groupBy("tile_id", "r_regionkey").agg(count(lit(1)).as("n_urls"))
    stats.join(urls, Seq("tile_id", "r_regionkey"), "left")
      .write.mode("overwrite").format("noop").save()
    // page count is base × repl by construction; recounting would re-run
    // the replicating explode through the 2 source splits (serial)
    Tables.events(spark, sfDir).count() * repl
  }

  def timeAt(cores: Int, sfDir: String, repl: Int): (Long, Double) = {
    val spark = buildSession(cores)
    try {
      // FULL-SIZE warm-up: the first full-scale run in a fresh session pays
      // one-time costs a quarter-size run does not reach (heap growth to
      // -Xmx, full-volume codegen/shuffle paths) — measured 2× wall-clock
      // on the first run vs steady state. The measured run is steady-state
      // throughput, which is what a long-lived executor delivers.
      runJob(spark, sfDir, repl)
      val t0 = System.nanoTime()
      val n  = runJob(spark, sfDir, repl)
      (n, (System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  /** Pure-CPU control (no shuffle, no strings): sum(sin(id)) over a range.
    * Its N→4N efficiency pins what the HOST could deliver at measurement
    * time — a same-session ceiling the job efficiency is judged against.
    */
  def cpuControlAt(cores: Int, n: Long): Double = {
    val spark = buildSession(cores)
    try {
      spark.range(n / 4).selectExpr("sum(sin(id))").head // warm-up
      val t0 = System.nanoTime()
      spark.range(n).selectExpr("sum(sin(id))").head
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }

  /** (idleTicks, stealTicks, totalTicks) from /proc/stat — external-load
    * stamp; steal bursts are the host's episodic-degradation signature.
    */
  def cpuTicks(): (Long, Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      (f(3) + f(4), if (f.length > 7) f(7) else 0L, f.sum)
    } catch { case _: Throwable => (0L, 0L, 0L) }

  // ---------------------------------------------------------------------
  // Skew demo (SURVEY §7.3-5): a Zipf-skewed shuffle join where AQE's skew
  // split CANNOT help — the join output's hashpartitioning(cell) is reused
  // by the downstream same-key aggregation, so OptimizeSkewedJoin must not
  // split the hot partition (it would break the agg's required
  // distribution). The head cell funnels ~70% of all rows through ONE
  // reducer. Spatial.saltedJoin spreads the join across (cell, salt); the
  // aggregation then recovers per-cell totals via map-side partials.
  // Broadcast is disabled to model a dim above the broadcast threshold
  // (at 100 TB the dim side often is).
  // ---------------------------------------------------------------------

  def skewSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One run of the skewed join+agg; returns (sec, checksum). */
  def skewJob(spark: SparkSession, rows: Long, cells: Int, salts: Int,
              salted: Boolean): (Double, Double) = {
    val fact = spark.range(rows).toDF("id")
      // Zipf-ish head: ~70% of rows in cell 0, the rest spread uniformly
      .withColumn("cell",
        when(pmod(xxhash64(col("id")), lit(10L)) < 7, 0L)
          .otherwise(pmod(xxhash64(col("id") * 31 + 7), lit(cells.toLong))))
      .withColumn("v", sin(col("id").cast("double")))
    val dim = spark.range(cells.toLong).toDF("cell")
      .withColumn("w", col("cell").cast("double") + 1.0)
    val joined =
      if (salted) Spatial.saltedJoin(fact, dim, Seq("cell"), "id", salts)
      else fact.join(dim, Seq("cell"))
    val agg = joined.groupBy("cell")
      .agg(sum(col("v") * col("w")).as("s"), count(lit(1)).as("n"))
    val t0 = System.nanoTime()
    val checksum = agg.agg(sum(col("n")).cast("double") + sum(abs(col("s")))).head.getDouble(0)
    ((System.nanoTime() - t0) / 1e9, checksum)
  }

  def skewMain(args: Array[String]): Unit = {
    val cores = if (args.length > 1) args(1).toInt else 8
    val rows  = if (args.length > 2) args(2).toLong else 30000000L
    val cells = 64; val salts = cores * 2
    val spark = skewSession(cores)
    try {
      skewJob(spark, rows / 4, cells, salts, salted = true)  // warm-up
      skewJob(spark, rows / 4, cells, salts, salted = false)
      // interleave + median, like the scaling runs
      val samples = (1 to 3).map { _ =>
        (skewJob(spark, rows, cells, salts, salted = false),
          skewJob(spark, rows, cells, salts, salted = true))
      }
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      val (tUnsalted, tSalted) = (med(samples.map(_._1._1)), med(samples.map(_._2._1)))
      val (c1, c2) = (samples.head._1._2, samples.head._2._2)
      require(math.abs(c1 - c2) <= 1e-6 * math.abs(c1), s"salted result diverges: $c1 vs $c2")
      println(f"""{"metric":"skew_join","cores":$cores,"rows":$rows,"cells":$cells,"salts":$salts,""" +
        f""""sec_unsalted":$tUnsalted%.2f,"sec_salted":$tSalted%.2f,""" +
        f""""speedup":${tUnsalted / tSalted}%.2f}""")
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "skew") return skewMain(args)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val repl  = if (args.length > 1) args(1).toInt else 20
    val small = if (args.length > 2) args(2).toInt else 2
    val big   = if (args.length > 3) args(3).toInt else 8
    // the sandbox host is noisy (variable steal time), so interleave the two
    // parallelism levels and take medians — noise then hits both equally
    val rounds = if (args.length > 4) args(4).toInt else 3
    val loadBefore =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val (i0, s0, t0) = cpuTicks()
    val samples = (1 to rounds).map { _ =>
      (timeAt(small, sfDir, repl), timeAt(big, sfDir, repl))
    }
    // same-session pure-CPU control at both core counts (interleaved too)
    val ctrlN = 1500000000L
    val ctrl = (1 to rounds).map { _ =>
      (cpuControlAt(small, ctrlN), cpuControlAt(big, ctrlN))
    }
    val (i1, s1, t1) = cpuTicks()
    val idlePct = if (t1 > t0) 100.0 * (i1 - i0).toDouble / (t1 - t0).toDouble else -1.0
    val stealPct = if (t1 > t0) 100.0 * (s1 - s0).toDouble / (t1 - t0).toDouble else -1.0
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val n1 = samples.head._1._1
    val n2 = samples.head._2._1
    require(n1 == n2)
    val tSmall = med(samples.map(_._1._2))
    val tBig   = med(samples.map(_._2._2))
    val thrSmall = n1 / tSmall
    val thrBig   = n2 / tBig
    val eff = (tSmall / tBig) / (big.toDouble / small)
    val cEff = (med(ctrl.map(_._1)) / med(ctrl.map(_._2))) / (big.toDouble / small)
    println(f"""{"metric":"scaling","pages":$n1,"cores_small":$small,"cores_big":$big,""" +
      f""""sec_small":$tSmall%.2f,"sec_big":$tBig%.2f,""" +
      f""""pages_per_sec_small":$thrSmall%.0f,"pages_per_sec_big":$thrBig%.0f,""" +
      f""""speedup":${tSmall / tBig}%.2f,"efficiency":$eff%.3f,""" +
      f""""control_sec_small":${med(ctrl.map(_._1))}%.2f,"control_sec_big":${med(ctrl.map(_._2))}%.2f,""" +
      f""""control_efficiency":$cEff%.3f,"idle_pct":$idlePct%.1f,"steal_pct":$stealPct%.2f,"loadavg_before":$loadBefore%.2f,""" +
      f""""sf":"$sfDir"}""")
  }
}
