package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Grid
import graft.operators.Clustering

/** ScalaCheck properties from SURVEY.md §5.2: haversine symmetry/bounds,
  * grid round-trip, rounding parity, percentile monotonicity. Driven by a
  * fixed-seed Gen loop (scalatestplus bridge is not in the offline cache).
  */
class PropertiesSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))(t => f(t._1, t._2, t._3, t._4))
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val lat = Gen.choose(-89.9, 89.9)
  private val lon = Gen.choose(-179.9, 179.9)

  test("haversine: symmetric, non-negative, zero iff same point") {
    forAll(lat, lon, lat, lon) { (a: Double, b: Double, c: Double, d: Double) =>
      val x = Clustering.haversine(a, b, c, d)
      val y = Clustering.haversine(c, d, a, b)
      assert(math.abs(x - y) < 1e-9)
      assert(x >= 0.0)
      assert(Clustering.haversine(a, b, a, b) === 0.0)
      // bounded by half the circumference (+1m slack for float error)
      assert(x <= math.Pi * 6371000.0 + 1.0)
    }
  }

  test("grid: level recovery, center round-trip, parent-prefix hierarchy") {
    import graft.functions.S2
    forAll(lat, lon, Gen.choose(1, 20)) { (la: Double, lo: Double, res: Int) =>
      val cell = Grid.cellId(la, lo, res)
      // level recoverable from the trailing-1 format
      assert(S2.level(cell) === res)
      // the cell's center re-encodes to the same cell (point inside bounds)
      val (cla, clo) = S2.centerLatLon(cell)
      assert(Grid.cellId(cla, clo, res) === cell)
      // hierarchy: bit-op parent equals encoding directly at res-1
      if (res > 1)
        assert(Grid.parentId(cell, res - 1) === Grid.cellId(la, lo, res - 1))
    }
  }

  test("npRound matches BigDecimal HALF_EVEN away from float-representation edges") {
    forAll(Gen.choose(-1000.0, 1000.0), Gen.choose(0, 6)) { (v: Double, dp: Int) =>
      val scaled = v * math.pow(10, dp)
      val nearHalf = math.abs(scaled - math.floor(scaled) - 0.5) < 1e-9
      whenever(!nearHalf) {
        val expected = BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        assert(math.abs(Clustering.npRound(v, dp) - expected) < math.pow(10.0, -dp) * 1e-6)
      }
    }
  }

  test("percentile: monotone in q, endpoints are min/max, median between") {
    forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { (xs: List[Double]) =>
      val s = xs
      assert(Clustering.percentile(s, 0.0) === s.min)
      assert(Clustering.percentile(s, 100.0) === s.max)
      val q25 = Clustering.percentile(s, 25.0)
      val q50 = Clustering.percentile(s, 50.0)
      val q75 = Clustering.percentile(s, 75.0)
      assert(q25 <= q50 + 1e-9 && q50 <= q75 + 1e-9)
      assert(Clustering.median(s) >= s.min && Clustering.median(s) <= s.max)
    }
  }

  test("DBSCAN invariants: labels total, noise below min_samples, cores clustered") {
    val ptGen = Gen.listOfN(120, Gen.zip(Gen.choose(0.0, 0.02), Gen.choose(0.0, 0.02)))
    forAll(ptGen) { (ps: List[(Double, Double)]) =>
      val arr = ps.toArray
      val labels = operators.Dbscan.run(arr, 0.005, 10)
      assert(labels.length === arr.length)
      // every non-noise label's cluster has ≥1 core point (≥ minSamples neighbors)
      labels.toSet.filter(_ != -1).foreach { l =>
        val members = arr.indices.filter(labels(_) == l)
        val hasCore = members.exists { i =>
          arr.indices.count { j =>
            val dl = arr(i)._1 - arr(j)._1; val dn = arr(i)._2 - arr(j)._2
            dl * dl + dn * dn <= 0.005 * 0.005
          } >= 10
        }
        assert(hasCore)
      }
    }
  }
}
