package graft.lineage

import java.nio.file.{Files, Paths}
import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume + per-partition lineage and metrics (north rule):
  * jobs run via spark-submit must be resumable, with per-partition lineage
  * and metrics persisted alongside results.
  *
  * Without Iceberg in this environment the pattern is implemented over
  * partitioned parquet with idempotent per-partition overwrite
  * (`partitionOverwriteMode=dynamic` ≙ MERGE-by-partition):
  *
  *   - [[MetricsListener]] captures per-task (= per-partition) rows,
  *     bytes, spill, and runtime from the Spark scheduler and flushes them
  *     to a `_metrics` parquet table keyed by (job_key, stage, partition);
  *   - [[CheckpointedRunner.runPartitioned]] processes a keyed unit of work
  *     (e.g. one day of pages) only if its key is absent from the
  *     `_checkpoint` table; output writes are partitioned by the key so a
  *     re-run overwrites only its own partition (idempotent resume).
  */
object Lineage {

  case class TaskMetric(job_key: String, stage_id: Int, partition_id: Int,
                        records_read: Long, bytes_read: Long,
                        shuffle_records_written: Long, memory_spilled: Long,
                        run_time_ms: Long, failed: Boolean)

  /** Scheduler listener accumulating per-task metrics for one job key. */
  class MetricsListener(jobKey: String) extends SparkListener {
    val metrics = mutable.ArrayBuffer.empty[TaskMetric]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null) metrics += TaskMetric(
        jobKey, t.stageId, t.taskInfo.index,
        m.inputMetrics.recordsRead, m.inputMetrics.bytesRead,
        m.shuffleWriteMetrics.recordsWritten, m.memoryBytesSpilled,
        m.executorRunTime, !t.taskInfo.successful)
    }
  }

  /** Run `body` with task-level metrics captured and appended to
    * `<metricsDir>/_metrics` parquet. Returns body's result.
    */
  def withMetrics[T](spark: SparkSession, jobKey: String, metricsDir: String)(body: => T): T = {
    val listener = new MetricsListener(jobKey)
    spark.sparkContext.addSparkListener(listener)
    try body
    finally {
      spark.sparkContext.removeSparkListener(listener)
      import spark.implicits._
      if (listener.metrics.nonEmpty)
        listener.metrics.toSeq.toDF()
          .withColumn("recorded_job", lit(jobKey))
          .write.mode(SaveMode.Append).parquet(s"$metricsDir/_metrics")
    }
  }
}

/** Resumable partitioned execution: process work units exactly once across
  * restarts, recording completion in a checkpoint table.
  */
object CheckpointedRunner {

  private def completedKeys(spark: SparkSession, ckptDir: String): Set[String] = {
    val p = Paths.get(ckptDir, "_checkpoint")
    if (!Files.exists(p)) Set.empty
    else spark.read.parquet(p.toString).select("key").collect().map(_.getString(0)).toSet
  }

  private def markComplete(spark: SparkSession, ckptDir: String, key: String): Unit = {
    import spark.implicits._
    Seq(key).toDF("key").write.mode(SaveMode.Append).parquet(s"$ckptDir/_checkpoint")
  }

  /** For each (key, unit) absent from the checkpoint: compute `job(unit)`,
    * write it under `outDir/key=<key>` (idempotent overwrite of that
    * partition alone), record metrics + completion. Returns keys run.
    */
  def runPartitioned(spark: SparkSession, ckptDir: String, outDir: String,
                     units: Seq[(String, () => DataFrame)]): Seq[String] = {
    val done = completedKeys(spark, ckptDir)
    val ran = mutable.ArrayBuffer.empty[String]
    units.filterNot { case (k, _) => done.contains(k) }.foreach { case (key, job) =>
      Lineage.withMetrics(spark, key, ckptDir) {
        job().write.mode(SaveMode.Overwrite).parquet(s"$outDir/key=$key")
      }
      markComplete(spark, ckptDir, key)
      ran += key
    }
    ran.toSeq
  }
}
