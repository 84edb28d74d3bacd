package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive partition sizing (optimization guide §2.2/§6): partition
  * counts derived from the plan's size estimate and the cluster width —
  * never a constant tuned for one deployment.
  *
  * Rationale: Spark sizes read/shuffle parallelism by BYTES (input splits,
  * AQE coalescing), which is right for I/O-bound stages but starves
  * CPU-bound per-row kernels — a single-split toy parquet feeding zlib or
  * md5-shingle work runs ONE task while the rest of the cores idle
  * (measured: media_features 6.4 s on 1 of 32 cores, r6 baseline).
  */
object Par {

  /** Spread `df` across the cluster BEFORE a CPU-heavy per-row stage —
    * but only when the input is byte-small enough that the scan/shuffle
    * would otherwise under-parallelize (plan size below cores ×
    * maxPartitionBytes). At scale this is the identity: big inputs already
    * carry enough splits, and adding a shuffle would be pure waste. `keys`
    * gives the deterministic hash-distribution key (any roughly-unique
    * column); required so the row→partition assignment is reproducible
    * under task retry (guide §2.5 — never round-robin on nondeterministic
    * input). No-op for streaming frames (no plan statistics).
    */
  def spreadForCpu(df: DataFrame, keys: Seq[Column]): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxPart = org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(cores) * BigInt(maxPart)) df
    else df.repartition(cores, keys: _*)
  }
}
