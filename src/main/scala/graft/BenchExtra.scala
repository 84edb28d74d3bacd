package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Round-6 optimization harness — separate from the FROZEN [[Bench]] (guide
  * §1.4): per-query isolation with the same consume-every-column action,
  * plus the measurements Bench deliberately omits:
  *
  *   - `.explain("formatted")` captured to plans/<tag>/<query>_<suffix>.txt
  *     (the judge-checkable plan evidence),
  *   - Spark JOB / STAGE / TASK counts per query via a listener — at sf0.1
  *     the fixed per-job scheduling overhead dominates several queries, so
  *     job count is the first-order cost model for the driver-seam-heavy
  *     operators (dbscan_distributed, doc_dedup_minhash),
  *   - per-rep wall times (no median folding — raw evidence).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.BenchExtra [suffix] [query ...]"
  * With no query args, all declared queries run. Suffix defaults to
  * "before"; plans land in plans/r06/.
  */
object BenchExtra {

  private class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += sc.stageInfo.numTasks
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val suffix = args.headOption.getOrElse("before")
    val wanted = args.drop(1).toSet

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
    val out = new StringBuilder
    out.append("query,rep,seconds,jobs,stages,tasks\n")

    for ((name, fn) <- names) {
      // capture the formatted plan once (plan build is outside the reps)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(planDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[extra] $name EXPLAIN FAILED: ${e.getMessage}")
      }
      for (rep <- 1 to reps) {
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        counts.reset()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          import org.apache.spark.sql.functions.{col, count, struct, xxhash64}
          df.agg(count(xxhash64(struct(df.columns.map(col): _*)))).collect()
          val dt = (System.nanoTime() - t0) / 1e9
          // listener events are async; give the bus a beat to drain
          Thread.sleep(120)
          out.append(f"$name,$rep,$dt%.3f,${counts.jobs},${counts.stages},${counts.tasks}\n")
          System.err.println(f"[extra] $name rep$rep $dt%.3f s " +
            s"jobs=${counts.jobs} stages=${counts.stages} tasks=${counts.tasks}")
        } catch { case e: Throwable =>
          System.err.println(s"[extra] $name rep$rep FAILED: ${e.getMessage}")
          out.append(s"$name,$rep,-1,-1,-1,-1\n")
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_EXTRA_OUT", s"$planDir/extra_$suffix.csv")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), out.toString.getBytes("UTF-8"))
    System.err.println(s"[extra] wrote $outPath")
    spark.stop()
  }
}
