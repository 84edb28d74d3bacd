package graft.operators

import scala.collection.mutable

/** Exact DBSCAN on raw (lat, lon) degrees with euclidean metric — the
  * reference's configuration (gscap/gps.py:1823-1826: eps=0.005 degrees,
  * min_samples=100, metric='euclidean'). Labels replicate scikit-learn's
  * assignment order (tests/test_gps.py:552-580 pins cluster means that
  * depend on it): neighborhoods are dist ≤ eps inclusive and count the
  * point itself; clusters are numbered in scan order of their first core
  * point; expansion is stack-based with neighbors visited in index order;
  * border points keep the label of the first cluster that reaches them.
  *
  * Used per-user inside flatMapGroups (users are independent → exact and
  * embarrassingly parallel); the cross-user web-scale variant is
  * [[DistributedDbscan]]. Neighbor search is grid-bucketed (cell = eps) so
  * a group of n points costs O(n · neighbors) instead of O(n²).
  */
object Dbscan {

  /** Returns labels (-1 = noise) aligned with the input order.
    * Fewer than 2 points → all noise (gps.py:1589-1590).
    */
  def run(pts: Array[(Double, Double)], eps: Double = 0.005, minSamples: Int = 100): Array[Int] = {
    val n = pts.length
    val labels = Array.fill(n)(-1)
    if (n < 2) return labels

    val eps2 = eps * eps
    // grid buckets of side eps: all neighbors of p are in the 3×3 ring
    val buckets = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Int]]
    def key(p: (Double, Double)) = (math.floor(p._1 / eps).toLong, math.floor(p._2 / eps).toLong)
    var i = 0
    while (i < n) {
      buckets.getOrElseUpdate(key(pts(i)), mutable.ArrayBuffer.empty) += i
      i += 1
    }

    def neighbors(i: Int): Array[Int] = {
      val (ky, kx) = key(pts(i))
      val out = mutable.ArrayBuffer.empty[Int]
      var dy = -1L
      while (dy <= 1) {
        var dx = -1L
        while (dx <= 1) {
          buckets.get((ky + dy, kx + dx)).foreach { b =>
            b.foreach { j =>
              val dlat = pts(i)._1 - pts(j)._1
              val dlon = pts(i)._2 - pts(j)._2
              if (dlat * dlat + dlon * dlon <= eps2) out += j
            }
          }
          dx += 1
        }
        dy += 1
      }
      out.sorted.toArray // index order, matching sklearn's brute neighborhoods
    }

    val neigh = Array.tabulate(n)(neighbors)
    val isCore = neigh.map(_.length >= minSamples)

    // stack-based expansion, one cluster per unlabeled core seed in scan
    // order; border points keep the first label that claims them
    var clusterId = 0
    i = 0
    while (i < n) {
      if (labels(i) == -1 && isCore(i)) {
        val stack = mutable.Stack.empty[Int]
        var cur = i
        var expanding = true
        while (expanding) {
          if (labels(cur) == -1) {
            labels(cur) = clusterId
            if (isCore(cur)) {
              neigh(cur).foreach { q => if (labels(q) == -1) stack.push(q) }
            }
          }
          if (stack.isEmpty) expanding = false else cur = stack.pop()
        }
        clusterId += 1
      }
      i += 1
    }
    labels
  }

  /** Most frequent non-noise label; ties break to the smallest label
    * (scipy.stats.mode semantics, gscap/gps.py:1788-1801). None if all noise.
    */
  def topCluster(labels: Array[Int]): Option[Int] = {
    val counts = labels.filter(_ != -1).groupBy(identity).view.mapValues(_.length)
    if (counts.isEmpty) None
    else Some(counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
  }
}
