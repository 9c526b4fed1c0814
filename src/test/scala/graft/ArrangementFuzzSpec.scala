package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial randomized validation of the arrangement engine:
  * deterministic pseudo-random fixtures checked against exact ground
  * truth (rect sweeps) and exact algebraic identities (inclusion-
  * exclusion), which hold for ARBITRARY polygons without needing an
  * independent overlay implementation.
  */
class ArrangementFuzzSpec extends AnyFunSuite {

  private def rnd(seed: Long, k: Int): Double = {
    val h = graft.sources.Pages.mix(seed * 1315423911L + k)
    ((h >>> 11) & 0xfffff).toDouble / 0xfffff.toDouble
  }

  private def rect(x0: Double, y0: Double, w: Double, h: Double): GPolygon =
    GPolygon(Array(GLine(Array(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, x0, y0))))

  private def area(ps: Seq[GPolygon]): Double = ps.map(GeomOps.area).sum

  /** Exact union area of axis-aligned rects by coordinate-compressed sweep. */
  private def exactRectUnion(rs: Seq[(Double, Double, Double, Double)]): Double = {
    val xs = rs.flatMap(r => Seq(r._1, r._3)).distinct.sorted
    val ys = rs.flatMap(r => Seq(r._2, r._4)).distinct.sorted
    var total = 0.0
    for (i <- 0 until xs.length - 1; j <- 0 until ys.length - 1) {
      val cx = (xs(i) + xs(i + 1)) / 2; val cy = (ys(j) + ys(j + 1)) / 2
      if (rs.exists(r => cx > r._1 && cx < r._3 && cy > r._2 && cy < r._4))
        total += (xs(i + 1) - xs(i)) * (ys(j + 1) - ys(j))
    }
    total
  }

  test("random rect dissolve matches the exact sweep (50 seeds)") {
    for (seed <- 1 to 50) {
      val n = 3 + (seed % 8)
      val rs = (0 until n).map { k =>
        val x0 = rnd(seed, 4 * k) * 20
        val y0 = rnd(seed, 4 * k + 1) * 20
        val w = 0.5 + rnd(seed, 4 * k + 2) * 8
        val h = 0.5 + rnd(seed, 4 * k + 3) * 8
        (x0, y0, x0 + w, y0 + h)
      }
      val expect = exactRectUnion(rs)
      val got = area(Arrangement.unionCascaded(
        rs.map(r => rect(r._1, r._2, r._3 - r._1, r._4 - r._2))))
      assert(math.abs(got - expect) < 1e-5 * math.max(1, expect),
        s"seed $seed: union $got vs sweep $expect")
    }
  }

  test("inclusion-exclusion identities on random star polygon pairs (40 seeds)") {
    def star(seed: Long, cx: Double, cy: Double): GPolygon = {
      val nv = 6 + (graft.sources.Pages.mix(seed) & 7).toInt
      val pts = (0 until nv).flatMap { k =>
        val r = 1.0 + rnd(seed, k) * 6
        val a = 2 * math.Pi * k / nv
        Seq(cx + r * math.cos(a), cy + r * math.sin(a))
      }.toArray
      GPolygon(Array(GLine(pts ++ Array(pts(0), pts(1)))))
    }
    for (seed <- 1 to 40) {
      val a = star(seed * 2 + 1, 0, 0)
      val b = star(seed * 2 + 2, rnd(seed, 99) * 6 - 3, rnd(seed, 98) * 6 - 3)
      val aA = GeomOps.area(a); val aB = GeomOps.area(b)
      val un = area(Arrangement.overlay2(a, b, 1))
      val in = area(Arrangement.overlay2(a, b, 0))
      val di = area(Arrangement.overlay2(a, b, 2))
      val sy = area(Arrangement.overlay2(a, b, 3))
      val tol = 1e-5 * math.max(1, aA + aB)
      assert(math.abs((un + in) - (aA + aB)) < tol,
        s"seed $seed incl-excl: ∪$un + ∩$in vs $aA + $aB")
      assert(math.abs(di - (aA - in)) < tol, s"seed $seed: A−B $di vs ${aA - in}")
      assert(math.abs(sy - (un - in)) < tol, s"seed $seed: A△B $sy vs ${un - in}")
      assert(in >= -tol && in <= math.min(aA, aB) + tol, s"seed $seed: ∩ bounds")
      assert(un >= math.max(aA, aB) - tol && un <= aA + aB + tol, s"seed $seed: ∪ bounds")
    }
  }

  test("random rect pair booleans match interval arithmetic (60 seeds)") {
    for (seed <- 1 to 60) {
      val x1 = rnd(seed, 0) * 10; val y1 = rnd(seed, 1) * 10
      val w1 = 1 + rnd(seed, 2) * 6; val h1 = 1 + rnd(seed, 3) * 6
      val x2 = rnd(seed, 4) * 10; val y2 = rnd(seed, 5) * 10
      val w2 = 1 + rnd(seed, 6) * 6; val h2 = 1 + rnd(seed, 7) * 6
      val iw = math.max(0, math.min(x1 + w1, x2 + w2) - math.max(x1, x2))
      val ih = math.max(0, math.min(y1 + h1, y2 + h2) - math.max(y1, y2))
      val inter = area(Arrangement.overlay2(rect(x1, y1, w1, h1), rect(x2, y2, w2, h2), 0))
      assert(math.abs(inter - iw * ih) < 1e-5 * math.max(1, iw * ih),
        s"seed $seed: ∩ $inter vs ${iw * ih}")
    }
  }

  test("large dissolve: 1500 rects via the bucketed noder, exact area") {
    val rs = (0 until 1500).map { k =>
      val x0 = rnd(7777, 4 * k) * 200
      val y0 = rnd(7777, 4 * k + 1) * 200
      val w = 0.5 + rnd(7777, 4 * k + 2) * 6
      val h = 0.5 + rnd(7777, 4 * k + 3) * 6
      (x0, y0, x0 + w, y0 + h)
    }
    val expect = exactRectUnion(rs)
    val t0 = System.nanoTime()
    val got = area(Arrangement.unionCascaded(
      rs.map(r => rect(r._1, r._2, r._3 - r._1, r._4 - r._2))))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(math.abs(got - expect) < 1e-4 * expect, s"union $got vs sweep $expect")
    // the uniform-grid candidate pruning must keep this out of O(S²)
    // territory (brute force on ~6000 segments × passes is >>30 s)
    assert(sec < 30.0, s"bucketed large dissolve took $sec s")
    info(f"1500-rect dissolve: $sec%.2f s, area $got%.1f")
  }

  test("dissolve of butted tile grid leaves one polygon, exact area") {
    // 6×6 grid of unit tiles sharing edges — the classic sliver trap
    val tiles = for (i <- 0 until 6; j <- 0 until 6) yield rect(i, j, 1, 1)
    val out = Arrangement.unionCascaded(tiles)
    assert(out.length === 1, s"grid dissolved to ${out.length} pieces")
    assert(out.head.rings.length === 1)
    assert(math.abs(area(out) - 36.0) < 1e-5)
  }
}
