package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.lineage.{CheckpointedRunner, Lineage}

/** Checkpoint/resume + per-partition metrics (north rule). */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("runPartitioned is resumable: completed keys skip, failed keys retry") {
    val dir = Files.createTempDirectory("lineage").toString
    var aRuns = 0
    var bAttempts = 0
    def units(bFails: Boolean) = Seq(
      "2024-01-01" -> (() => { aRuns += 1; Seq((1, "a")).toDF("id", "v") }),
      "2024-01-02" -> (() => {
        bAttempts += 1
        if (bFails) throw new RuntimeException("transient")
        Seq((2, "b")).toDF("id", "v")
      }))

    // first attempt: a completes, b fails mid-run
    intercept[RuntimeException] {
      CheckpointedRunner.runPartitioned(spark, dir, s"$dir/out", units(bFails = true))
    }
    // resume: a must NOT re-run; b retries and completes
    val ran = CheckpointedRunner.runPartitioned(spark, dir, s"$dir/out", units(bFails = false))
    assert(ran === Seq("2024-01-02"))
    assert(aRuns === 1 && bAttempts === 2)
    // third run: nothing left
    assert(CheckpointedRunner.runPartitioned(spark, dir, s"$dir/out", units(bFails = false)).isEmpty)
    // results for both partitions exist
    val out = spark.read.parquet(s"$dir/out").select("v").as[String].collect().toSet
    assert(out === Set("a", "b"))
  }

  test("metrics listener records per-partition task metrics") {
    val dir = Files.createTempDirectory("metrics").toString
    Lineage.withMetrics(spark, "job1", dir) {
      spark.range(0, 10000, 1, 4).selectExpr("sum(id)").collect()
    }
    // listener flush is async-ish on task end; read what was written
    val m = spark.read.parquet(s"$dir/_metrics")
    assert(m.count() >= 4) // at least one task per partition
    assert(m.select("job_key").distinct().as[String].collect().toSeq === Seq("job1"))
    assert(m.where(col("run_time_ms") < 0).count() === 0)
  }
}
