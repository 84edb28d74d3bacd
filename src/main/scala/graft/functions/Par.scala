package graft.functions

import org.apache.spark.sql.DataFrame

/** Scale-adaptive partition sizing (optimization guide §2.2/§6): partition
  * counts derived from the plan's size estimate with a cluster-width floor —
  * never a constant tuned for one deployment.
  *
  * Rationale: AQE coalesces small shuffles by BYTES, which is right for
  * I/O-bound stages but starves CPU-bound per-row kernels — a single-split
  * toy parquet feeding zlib/DBSCAN work coalesces to ONE task and runs one
  * core while the rest idle (measured: media_features 6.4 s on 1 of 32
  * cores, r6 baseline). The floor gives every core work on small inputs;
  * the bytes term keeps partitions near `targetBytes` on big ones, so the
  * same call sites stay sane at 100 TB.
  */
object Par {

  /** Partition count for a CPU-heavy stage over `df`:
    * max(defaultParallelism, plan-size / targetBytes), clamped to 2^20.
    */
  def adaptiveN(df: DataFrame, targetBytes: Long = 256L << 20): Int = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes =
      if (bytes <= 0 || !bytes.isValidLong) cores
      else math.min((bytes.toLong / targetBytes) + 1L, 1L << 20).toInt
    math.max(cores, byBytes)
  }
}
