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
    *
    * Exact-duplicate reduction: points sharing a coordinate have identical
    * neighborhoods, identical (weighted) core status, and — because cluster
    * seeds scan in first-occurrence order and a border coordinate is always
    * claimed by the lowest-numbered cluster that reaches it — identical
    * labels. The algorithm therefore runs over UNIQUE coordinates with
    * multiplicities (the classic weighted-DBSCAN reduction, exact): GPS
    * streams are heavily lattice-valued, so this collapses the O(dense-site²)
    * neighbor lists that dominated per-user cost.
    */
  def run(pts: Array[(Double, Double)], eps: Double = 0.005, minSamples: Int = 100): Array[Int] =
    runWithCore(pts, eps, minSamples)._1

  /** [[run]] plus per-point core flags (weighted neighborhood ≥ minSamples,
    * counting the point itself — sklearn's core_sample_indices_). Core
    * membership and the label of every core point are order-independent
    * (only border labels depend on scan order), which is what makes a
    * per-(user, label) core summary exactly SQL-expressible: with input
    * sorted by a unique id, sklearn's cluster numbering is the rank of each
    * cluster's minimum core id (seeds scan in first-occurrence order).
    */
  def runWithCore(pts: Array[(Double, Double)], eps: Double = 0.005,
                  minSamples: Int = 100): (Array[Int], Array[Boolean]) = {
    val n = pts.length
    val labels = Array.fill(n)(-1)
    if (n == 0) return (labels, Array.empty)
    // n == 1 only shortcuts when the lone point cannot be core: sklearn
    // (and the userDbscanSql twin, whose self-pair carries w ≥ minSamples)
    // makes a single point core under minSamples ≤ 1 — the general path
    // below reproduces that; an unconditional early return here diverged.
    if (n < 2 && minSamples > 1) return (labels, Array.fill(n)(false))

    val eps2 = eps * eps
    // collapse exact duplicates; uid order = first-occurrence (= min input
    // index) order, preserving sklearn's scan-order cluster numbering
    val uidByCoord = mutable.HashMap.empty[(Double, Double), Int]
    val uidOf = new Array[Int](n)
    val rep = mutable.ArrayBuffer.empty[(Double, Double)]
    val weight = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      val u = uidByCoord.getOrElseUpdate(pts(i), { rep += pts(i); weight += 0; rep.length - 1 })
      weight(u) += 1
      uidOf(i) = u
      i += 1
    }
    val m = rep.length

    // grid buckets of side eps over unique coords: all eps-neighbors of a
    // coord are in its 3×3 cell ring
    val buckets = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Int]]
    def key(p: (Double, Double)) = (math.floor(p._1 / eps).toLong, math.floor(p._2 / eps).toLong)
    var u = 0
    while (u < m) {
      buckets.getOrElseUpdate(key(rep(u)), mutable.ArrayBuffer.empty) += u
      u += 1
    }

    def neighborsU(u: Int): Array[Int] = {
      val (ky, kx) = key(rep(u))
      val out = mutable.ArrayBuffer.empty[Int]
      var dy = -1L
      while (dy <= 1) {
        var dx = -1L
        while (dx <= 1) {
          buckets.get((ky + dy, kx + dx)).foreach { b =>
            b.foreach { v =>
              val dlat = rep(u)._1 - rep(v)._1
              val dlon = rep(u)._2 - rep(v)._2
              if (dlat * dlat + dlon * dlon <= eps2) out += v
            }
          }
          dx += 1
        }
        dy += 1
      }
      out.sorted.toArray // first-occurrence order (matches index-order visiting)
    }

    val neigh  = Array.tabulate(m)(neighborsU)
    val isCore = neigh.map(_.map(weight).sum >= minSamples) // weighted degree incl. self

    // stack-based expansion over unique coords, one cluster per unlabeled
    // core seed in first-occurrence order; border coords keep the first
    // (lowest-numbered) cluster that claims them
    val ulabels = Array.fill(m)(-1)
    var clusterId = 0
    u = 0
    while (u < m) {
      if (ulabels(u) == -1 && isCore(u)) {
        val stack = mutable.Stack.empty[Int]
        var cur = u
        var expanding = true
        while (expanding) {
          if (ulabels(cur) == -1) {
            ulabels(cur) = clusterId
            if (isCore(cur)) {
              neigh(cur).foreach { q => if (ulabels(q) == -1) stack.push(q) }
            }
          }
          if (stack.isEmpty) expanding = false else cur = stack.pop()
        }
        clusterId += 1
      }
      u += 1
    }
    i = 0
    val core = new Array[Boolean](n)
    while (i < n) { labels(i) = ulabels(uidOf(i)); core(i) = isCore(uidOf(i)); i += 1 }
    (labels, core)
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
