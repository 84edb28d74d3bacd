package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation with
  * pointer halving — the shared kernel behind [[DistributedDbscan]]'s
  * large-graph branch and [[Docs.nearDupClusters]].
  *
  * Contract: `nodes` has one long column `uid`; `edges` has `(a_uid, b_uid)`
  * and MUST contain BOTH directions of every undirected edge — each round
  * propagates labels b→a only, so a one-directional edge set strands the
  * component minimum on one side. Labels converge to the component-minimum
  * uid in O(log diameter) rounds (min-propagation + comp ← comp(comp)
  * halving); every round is one aggregation plus two joins over frames
  * keyed by uid, localCheckpointed to cut lineage.
  */
object Components {

  def minLabel(nodes: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    var comp = nodes.select(col("uid"), col("uid").as("comp"))
      .localCheckpoint(eager = true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbors = edges
        .join(comp.withColumnRenamed("uid", "b_uid").withColumnRenamed("comp", "nc"), Seq("b_uid"))
        .groupBy(col("a_uid").as("uid"))
        .agg(min("nc").as("minNc"))
      // min-propagation + pointer-halving (comp ← comp(comp)); the
      // round-start comp rides along as `old` so convergence is detectable
      // from the checkpointed frame alone (no extra join job)
      val prop = comp.join(viaNeighbors, Seq("uid"), "left")
        .select(col("uid"), col("comp").as("old"),
          least(col("comp"), coalesce(col("minNc"), col("comp"))).as("comp"))
      val halved = prop.as("p")
        .join(prop.select(col("uid").as("comp"), col("comp").as("cc")).as("m"), Seq("comp"), "left")
        .select(col("uid"), col("old"),
          least(col("comp"), coalesce(col("cc"), col("comp"))).as("comp"))
        .localCheckpoint(eager = true)
      iter += 1
      // probe convergence every 2nd round only — a cheap scan over the
      // local checkpoint, half as many probe jobs as checking every round
      if (iter % 2 == 0 || iter >= maxIters)
        converged = halved.where(col("comp") =!= col("old")).count() == 0L
      comp = halved.select("uid", "comp")
    }
    comp
  }
}
