package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (AS-OF) join: for every left row, the single most recent
  * right row per key with right.ts ≤ left.ts — the feature-lookup join
  * (price-as-of, weather-as-of) that a naive range join turns into a
  * per-row interval explosion.
  *
  * Shape: tag both sides, union, ONE running last-non-null window per value
  * column, keep the left rows. One shuffle on `keys` plus a per-key sort —
  * no range join, no cross product, and the window is a running frame
  * (O(n) per key, not O(n²)). At equal timestamps the right row sorts
  * first (tag 0 < 1): inclusive at-or-before semantics, identical to
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` oracle.
  *
  * The right side must be unique per (keys, ts) — pre-aggregate otherwise,
  * or the tie order among equal right rows is nondeterministic.
  *
  * All value columns ride in ONE struct through a single last(ignoreNulls)
  * window, so the matched right row is atomic: a row-level NULL in one
  * value column survives (it is NOT skipped for an older non-null value),
  * and multi-column outputs can never mix fields from different right rows
  * — per-column last() windows would do both.
  */
object Temporal {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val valueCols = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    val carryCols = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val vType = org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        carryCols.map(col) :+ lit(null).cast(vType).as("__v"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__v"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++ carryCols.map(col) ++
        valueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Interval (containment) join: left rows where leftTs ∈ [start, end]
    * inclusive, per key — bucketized equi prejoin + exact refine. Intervals
    * explode to every `chunkSeconds`-sized time chunk they span; points
    * join on their single chunk, so the shuffle is an EQUI join on
    * (keys, chunk) — never an inequality/theta join — and each matching
    * (point, interval) pair is found exactly once (the point's chunk is
    * unique). Pick `chunkSeconds` near the typical interval span: cost per
    * interval is ceil(span/chunk)+1 exploded rows. Intervals must satisfy
    * start ≤ end (a descending `sequence` would fabricate chunks).
    *
    * Pathological spans are BOUNDED, not silently exploded: an interval
    * spanning more than `maxChunksPerInterval` chunks (a years-long
    * [start, end] under an hour chunk would fabricate ~10⁴ rows) is routed
    * to a keys-only equi join + exact refine instead. Same results, and the
    * explode stays ≤ maxChunksPerInterval rows per interval; the fallback
    * join is proportional to the (assumed rare) oversized intervals — if
    * MOST intervals are oversized, `chunkSeconds` is mis-sized and the
    * fallback's per-key fan-out is the honest cost of that.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, startCol: String, endCol: String,
                   chunkSeconds: Long = 3600L,
                   maxChunksPerInterval: Long = 10000L): DataFrame = {
    def chunkOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("long") / chunkSeconds).cast("long")
    val nChunks = chunkOf(col(endCol)) - chunkOf(col(startCol)) + 1
    val refine = col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol)
    val l = left.withColumn("__chunk", chunkOf(col(leftTs)))
    val r = right.where(nChunks <= lit(maxChunksPerInterval))
      .withColumn("__chunk",
        explode(sequence(chunkOf(col(startCol)), chunkOf(col(endCol)))))
    val chunked = l.join(r, keys :+ "__chunk").where(refine).drop("__chunk")
    val oversized = left
      .join(right.where(nChunks > lit(maxChunksPerInterval)), keys)
      .where(refine)
    chunked.unionByName(oversized.select(chunked.columns.map(col): _*))
  }
}
