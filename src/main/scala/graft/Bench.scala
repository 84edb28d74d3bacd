package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query timed at local[cpus].
  *
  * Self-evidencing protocol (the sandbox host degrades episodically, up to
  * 4× — see CLAUDE.md): queries run `reps` INTERLEAVED repetitions
  * (q1..qn, q1..qn, …) so a host stall hits one rep of many queries instead
  * of all reps of one; the reported per-query figure is the MEDIAN across
  * reps; and the JSON stamps host idle% (from /proc/stat, sampled before and
  * after) plus the JVM max heap, so a degraded-host artifact is recognizable
  * as such. All reps are also emitted under "runs" for inspection.
  */
object Bench {

  /** (idleTicks, stealTicks, totalTicks) from the aggregate /proc/stat cpu
    * line. Steal is stamped separately: the host's episodic 10-50× task
    * slowdowns show as hypervisor steal bursts that plain idle% (which our
    * own usage dominates) cannot reveal.
    */
  private def cpuTicks(): Option[(Long, Long, Long)] =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // fields: user nice system idle iowait irq softirq steal ...
      Some((f(3) + f(4), if (f.length > 7) f(7) else 0L, f.sum))
    } catch { case _: Throwable => None }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) 0.0 else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // external-load indicator sampled BEFORE we start consuming cores
    // (idle% during the run necessarily includes our own usage)
    val loadBefore =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }

    val t0Ticks = cpuTicks()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val runs = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, fn) <- names) {
      val t0 = System.nanoTime()
      // consume EVERY output column, not just row count: under a bare
      // count() ColumnPruning drops the final projection, so
      // projection-only queries (doc_quality, doc_winnow, pages_text, …)
      // were partially timing row counting instead of the operator. The
      // xxhash64-over-struct aggregate forces each column to materialize
      // while keeping the action a cheap single-row collect.
      try {
        val df = fn(spark, sfDir)
        import org.apache.spark.sql.functions.{col, count, struct, xxhash64}
        df.agg(count(xxhash64(struct(df.columns.map(col): _*)))).collect()
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop leftover cache/localCheckpoint blocks so queries don't
      // interfere (ContextCleaner reclaims on GC)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      runs(name) = runs(name) :+ dt
    }
    val (idlePct, stealPct) = (t0Ticks, cpuTicks()) match {
      case (Some((i0, s0, t0t)), Some((i1, s1, t1t))) if t1t > t0t =>
        (100.0 * (i1 - i0).toDouble / (t1t - t0t).toDouble,
         100.0 * (s1 - s0).toDouble / (t1t - t0t).toDouble)
      case _ => (-1.0, -1.0)
    }
    val heapGb = Runtime.getRuntime.maxMemory / 1e9

    val medians = names.map { case (k, _) => k -> median(runs(k)) }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val allRuns = names.map { case (k, _) =>
      s"\"" + k + "\":" + runs(k).mkString("[", ",", "]") }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"aggregation":"median","idle_pct":${f"$idlePct%.1f"},"steal_pct":${f"$stealPct%.2f"},"loadavg_before":${f"$loadBefore%.2f"},"heap_gb":${f"$heapGb%.1f"},"cpus":$cpus,"runs":$allRuns}""")
    spark.stop()
  }
}
