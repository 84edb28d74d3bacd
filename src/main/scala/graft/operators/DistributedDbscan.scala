package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed DBSCAN over one global point cloud — the web-scale companion
  * to the per-user exact [[Dbscan]] (SURVEY.md §2 G7, §4.2).
  *
  * Same cluster definition as the reference configuration (euclidean on raw
  * degrees, eps-inclusive neighborhoods counting self, core = ≥ minSamples):
  *
  *   1. bucket points into eps-sized grid cells → every eps-neighbor of a
  *      point lives in the 3×3 cell ring, so the neighbor search is a
  *      cell-EQUI join (explode the 9 probe cells on one side), never a
  *      cartesian theta join;
  *   2. core flags from the neighbor-count aggregation;
  *   3. clusters = connected components over core-core eps-edges, found by
  *      iterative min-component-id propagation (each round: one agg + one
  *      join; persisted + localCheckpoint to cut lineage); converges in
  *      O(graph diameter) rounds — eps-graphs of spatial data have tiny
  *      diameters per component;
  *   4. border points join the smallest component id among their core
  *      neighbors (deterministic; cluster MEMBERSHIP matches single-node
  *      DBSCAN exactly — only the tie choice for a border point reachable
  *      from two clusters may differ, which single-node resolves by scan
  *      order);
  *   5. labels canonicalized 0..k-1 by each component's minimum point id.
  *
  * Scale notes: shuffle keys are grid cells; hot cells (skew) are handled by
  * AQE skew-join splitting — and the 9× probe-side explode keeps per-key
  * fanout bounded. Output: (id, label) with label = -1 for noise.
  */
object DistributedDbscan {

  def run(points: DataFrame, eps: Double = 0.005, minSamples: Int = 100): DataFrame = {
    val spark = points.sparkSession
    val eps2 = eps * eps

    val pts = points.select(col("id").cast("long"), col("lat"), col("lon"))
      .withColumn("cy", floor(col("lat") / eps).cast("long"))
      .withColumn("cx", floor(col("lon") / eps).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // probe side: each point probes its 3×3 cell ring (equi-join keys)
    val probes = pts.select(
      col("id").as("a_id"), col("lat").as("a_lat"), col("lon").as("a_lon"),
      explode(array((for (dy <- -1 to 1; dx <- -1 to 1) yield
        struct((col("cy") + dy).as("cy"), (col("cx") + dx).as("cx"))): _*)).as("cell"))
      .select(col("a_id"), col("a_lat"), col("a_lon"),
        col("cell.cy").as("cy"), col("cell.cx").as("cx"))

    val dlat = col("a_lat") - col("lat")
    val dlon = col("a_lon") - col("lon")
    val pairs = probes.join(pts, Seq("cy", "cx"))
      .where(dlat * dlat + dlon * dlon <= eps2)
      .select(col("a_id"), col("id").as("b_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val degrees = pairs.groupBy("a_id").agg(count(lit(1)).as("deg"))
    val core = degrees.where(col("deg") >= minSamples).select(col("a_id").as("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // core-core edges (both directions retained for propagation)
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "a_id"), Seq("a_id"))
      .join(core.withColumnRenamed("id", "b_id"), Seq("b_id"))
      .select("a_id", "b_id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // iterative min-label propagation over core points
    var comp = core.select(col("id"), col("id").as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      val viaNeighbors = coreEdges
        .join(comp.withColumnRenamed("id", "b_id").withColumnRenamed("comp", "nc"), Seq("b_id"))
        .groupBy(col("a_id").as("id"))
        .agg(min("nc").as("minNc"))
      val next = comp.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("minNc"), col("comp"))).as("comp"))
        .localCheckpoint(eager = true)
      changed = next.join(comp.withColumnRenamed("comp", "old"), Seq("id"))
        .where(col("comp") =!= col("old")).count()
      comp.unpersist()
      comp = next.persist(StorageLevel.MEMORY_AND_DISK)
      iter += 1
    }

    // border points: smallest component among core neighbors
    val borderComp = pairs
      .join(core.withColumnRenamed("id", "a_id"), Seq("a_id"), "left_anti") // a not core
      .join(comp.withColumnRenamed("id", "b_id"), Seq("b_id"))              // b core w/ comp
      .groupBy(col("a_id").as("id"))
      .agg(min("comp").as("comp"))

    val assigned = comp.unionByName(borderComp)

    // canonical labels: dense rank of component min-id
    val compMin = assigned.groupBy("comp").agg(min("id").as("cmin"))
    val ranked = compMin.select(col("comp"),
      (row_number().over(org.apache.spark.sql.expressions.Window.orderBy("cmin")) - 1).as("label"))

    pts.select("id")
      .join(assigned.join(ranked, Seq("comp")).select("id", "label"), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), lit(-1)).cast("int").as("label"))
  }
}
