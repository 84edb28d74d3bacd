package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.S2

/** Structural pins for the S2 codec. No external fixture files exist in this
  * offline environment, so correctness is pinned by the properties that
  * DEFINE the scheme (each would fail under any table/format error):
  *
  *   - the published level-0 face-cell ids (tokens 1,3,5,7,9,b);
  *   - Hilbert continuity: consecutive ids on a face are grid-adjacent —
  *     this uniquely exercises every entry of the orientation tables;
  *   - encode/decode round-trips and the parent-prefix property;
  *   - the quadratic-projection kMinWidth metric, measured;
  *   - ring coverage incl. cube-edge/corner straddling (the kNN acceptance
  *     bound in Spatial.nearestNeighborCellRing builds on it).
  */
class S2Spec extends AnyFunSuite {

  test("level-0 face cells match the published S2 face-cell id format") {
    val faces = Seq((0.0, 0.0, 0), (0.0, 90.0, 1), (90.0, 0.0, 2),
      (0.0, 180.0, 3), (0.0, -90.0, 4), (-90.0, 0.0, 5))
    for ((la, lo, f) <- faces)
      assert(S2.cellId(la, lo, 0) === ((f.toLong << 61) | (1L << 60)), s"face $f")
  }

  test("Hilbert continuity: consecutive cells on a face are edge-adjacent (level 5, all faces)") {
    for (face <- 0 until 6) {
      val n = 1 << 5
      val cells = (for (i <- 0 until n; j <- 0 until n) yield S2.fromFaceIJ(face, i, j, 5)).sorted
      assert(cells.distinct.size === n * n)
      val ijs = cells.map { id =>
        val (f2, i, j, l) = S2.toFaceIJ(id)
        assert(f2 === face && l === 5)
        (i, j)
      }
      ijs.sliding(2).foreach { case Seq((i1, j1), (i2, j2)) =>
        assert(math.abs(i1 - i2) + math.abs(j1 - j2) === 1,
          s"face $face: consecutive Hilbert cells not adjacent: ($i1,$j1)->($i2,$j2)")
      }
    }
  }

  test("encode/decode round-trip + parent prefix (randomized)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5000) {
      val la = rnd.nextDouble() * 178.0 - 89.0
      val lo = rnd.nextDouble() * 359.9 - 179.95
      val lvl = 1 + rnd.nextInt(22)
      val id = S2.cellId(la, lo, lvl)
      assert(S2.level(id) === lvl)
      val (cla, clo) = S2.centerLatLon(id)
      assert(S2.cellId(cla, clo, lvl) === id, s"center round-trip ($la,$lo,$lvl)")
      if (lvl > 1) {
        val p = rnd.nextInt(lvl - 1) + 1
        assert(S2.parentId(id, p) === S2.cellId(la, lo, p), s"parent ($la,$lo,$lvl->$p)")
      }
    }
  }

  private def ll2xyz(la: Double, lo: Double): (Double, Double, Double) = {
    val p = math.toRadians(la); val t = math.toRadians(lo)
    (math.cos(p) * math.cos(t), math.cos(p) * math.sin(t), math.sin(p))
  }
  private def angDeg(a: (Double, Double), b: (Double, Double)): Double = {
    val (x1, y1, z1) = ll2xyz(a._1, a._2); val (x2, y2, z2) = ll2xyz(b._1, b._2)
    math.acos(math.min(1.0, x1 * x2 + y1 * y2 + z1 * z2)) * 180.0 / math.Pi
  }

  test("kMinWidth metric holds: adjacent-cell center spacing >= (2*sqrt2/3)*2^-level") {
    val rnd = new scala.util.Random(7)
    var minW = Double.MaxValue
    var maxW = 0.0
    for (_ <- 1 to 3000) {
      val la = rnd.nextDouble() * 178.0 - 89.0
      val lo = rnd.nextDouble() * 359.9 - 179.95
      val id = S2.cellId(la, lo, 8)
      val (face, i, j, _) = S2.toFaceIJ(id)
      val n = 1 << 8
      for ((di, dj) <- Seq((0, 1), (1, 0)) if i + di < n && j + dj < n) {
        val w = angDeg(S2.centerLatLon(id), S2.centerLatLon(S2.fromFaceIJ(face, i + di, j + dj, 8)))
        if (w < minW) minW = w
        if (w > maxW) maxW = w
      }
    }
    assert(minW >= S2.minWidthDeg(8), f"measured $minW%.6f < bound ${S2.minWidthDeg(8)}%.6f")
    // equal-area character: spacing spread stays bounded (the property an
    // equirectangular grid lacks — its pole cells shrink without bound)
    assert(maxW / minW < 2.2, f"spacing ratio ${maxW / minW}%.3f")
  }

  test("ring coverage: any point within k*minWidth of a dim is inside the dim's k-ring") {
    val rnd = new scala.util.Random(11)
    var checked = 0
    for (_ <- 1 to 20000) {
      val lvl = 6 + rnd.nextInt(8)
      // bias a third of samples to cube corners (lat ±35.26, lon ±45/±135)
      // and a third to face edges, where cross-face wrap must hold
      val mode = rnd.nextInt(3)
      val la0 = if (mode == 0) rnd.nextDouble() * 178.0 - 89.0
                else 35.26 + (rnd.nextDouble() - 0.5) * 2.0
      val lo0 = if (mode < 2) rnd.nextDouble() * 359.9 - 179.95
                else 45.0 + (rnd.nextDouble() - 0.5) * 2.0
      val k = 1 + rnd.nextInt(2)
      val r = k * S2.minWidthDeg(lvl)
      val ang = rnd.nextDouble() * 2 * math.Pi
      val dist = rnd.nextDouble() * r * 0.999
      val la1 = la0 + dist * math.cos(ang)
      val lo1 = lo0 + dist * math.sin(ang) / math.max(0.05, math.cos(math.toRadians(la0)))
      if (la1.abs <= 89.9 && lo1.abs <= 179.9 && angDeg((la0, lo0), (la1, lo1)) <= r) {
        val ring = S2.ringCells(S2.cellId(la0, lo0, lvl), k)
        assert(ring.contains(S2.cellId(la1, lo1, lvl)),
          s"ring miss: lvl=$lvl k=$k dim=($la0,$lo0) pt=($la1,$lo1)")
        checked += 1
      }
    }
    assert(checked > 15000)
  }
}
