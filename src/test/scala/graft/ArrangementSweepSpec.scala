package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the sweep-line candidate enumerator (`Arrangement.sweepPairs`):
  * forced-sweep mode must produce BIT-IDENTICAL arrangement output to the
  * grid enumerator on randomized fixtures (both feed the same exact
  * predicates, so any divergence is a missed candidate pair), and the
  * forced-sweep dissolve must still match the exact rect-union sweep
  * ground truth. Suites run sequentially in the forked test JVM, so the
  * global mode flag is safe to flip under try/finally.
  */
class ArrangementSweepSpec extends AnyFunSuite {

  private def rnd(seed: Long, k: Int): Double = {
    val h = graft.sources.Pages.mix(seed * 1315423911L + k)
    ((h >>> 11) & 0xfffff).toDouble / 0xfffff.toDouble
  }

  private def rect(x0: Double, y0: Double, w: Double, h: Double): GPolygon =
    GPolygon(Array(GLine(Array(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, x0, y0))))

  private def star(seed: Long, cx: Double, cy: Double): GPolygon = {
    val nv = 6 + (graft.sources.Pages.mix(seed) & 7).toInt
    val pts = (0 until nv).flatMap { k =>
      val r = 1.0 + rnd(seed, k) * 6
      val a = 2 * math.Pi * k / nv
      Seq(cx + r * math.cos(a), cy + r * math.sin(a))
    }
    GPolygon(Array(GLine((pts ++ pts.take(2)).toArray)))
  }

  private def wktSet(ps: Seq[GPolygon]): Seq[String] =
    ps.map(p => Geom.toWkt(p)).sorted

  private def withMode[A](mode: Int)(f: => A): A = {
    val prev = Arrangement.noderMode
    Arrangement.noderMode = mode
    try f finally Arrangement.noderMode = prev
  }

  test("sweep and grid enumerators emit identical overlays (60 seeds)") {
    for (seed <- 1 to 60) {
      val a = star(seed * 2 + 1, rnd(seed, 100) * 4, rnd(seed, 101) * 4)
      val b = star(seed * 2 + 2, rnd(seed, 102) * 4, rnd(seed, 103) * 4)
      for (op <- 0 to 3) {
        val grid = withMode(1)(Arrangement.overlay2(a, b, op))
        val sweep = withMode(2)(Arrangement.overlay2(a, b, op))
        assert(wktSet(grid) === wktSet(sweep), s"seed $seed op $op")
      }
    }
  }

  test("sweep and grid dissolves are identical on mixed-scale rect sets (20 seeds)") {
    for (seed <- 1 to 20) {
      val n = 40 + (seed % 20)
      val rs = (0 until n).map { k =>
        // mixed scales: every 4th rect is ~100x smaller (the case grid
        // bucketing handles worst — one cell size can't fit both)
        val scale = if (k % 4 == 0) 0.08 else 8.0
        val x0 = rnd(seed, 4 * k) * 60
        val y0 = rnd(seed, 4 * k + 1) * 60
        rect(x0, y0, 0.2 * scale + rnd(seed, 4 * k + 2) * scale,
          0.2 * scale + rnd(seed, 4 * k + 3) * scale)
      }
      val grid = withMode(1)(Arrangement.unionCascaded(rs))
      val sweep = withMode(2)(Arrangement.unionCascaded(rs))
      assert(wktSet(grid) === wktSet(sweep), s"seed $seed")
    }
  }

  test("batched anchor sweep classifies many disjoint + nested components") {
    // 40 nested squares: overlapping envelopes force ONE arrangement with
    // 40 edge-disjoint dual components (> the 8-component threshold, so
    // the batched x-sweep anchors every one through a 40-deep nesting
    // chain); filled union = the outermost square
    val nested = (0 until 40).map(k => rect(k, k, 2.0 * (40 - k), 2.0 * (40 - k)))
    val got = Arrangement.unionCascaded(nested).map(GeomOps.area).sum
    val expect = GeomOps.area(nested.head)
    assert(math.abs(got - expect) < 1e-6 * expect)

    // nesting: a big ring (via symdifference of two rects = donut) with
    // 12 disjoint islands inside its hole — islands are their own dual
    // components whose outer-face winding is NONZERO relative to nothing
    // (the hole is outside the donut), all anchored by the same sweep
    val outerR = rect(0, 0, 100, 100)
    val innerR = rect(10, 10, 80, 80)
    val donut = Arrangement.overlay2(outerR, innerR, 2) // difference → ring
    assert(donut.nonEmpty && donut.head.rings.length == 2)
    val inside = (0 until 12).map(k => rect(20 + 5 * (k % 4), 20 + 5 * (k / 4), 2, 2))
    val all = Arrangement.unionCascaded(donut ++ inside)
    val expectArea = GeomOps.area(donut.head) + inside.map(GeomOps.area).sum
    assert(math.abs(all.map(GeomOps.area).sum - expectArea) < 1e-4 * expectArea)
  }

  test("forced-sweep rect dissolve matches the exact coordinate sweep (25 seeds)") {
    def exactRectUnion(rs: Seq[(Double, Double, Double, Double)]): Double = {
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
    withMode(2) {
      for (seed <- 1 to 25) {
        val n = 3 + (seed % 8)
        val rs = (0 until n).map { k =>
          val x0 = rnd(seed, 4 * k) * 20
          val y0 = rnd(seed, 4 * k + 1) * 20
          val w = 0.5 + rnd(seed, 4 * k + 2) * 8
          val h = 0.5 + rnd(seed, 4 * k + 3) * 8
          (x0, y0, x0 + w, y0 + h)
        }
        val expect = exactRectUnion(rs)
        val got = Arrangement.unionCascaded(
          rs.map(r => rect(r._1, r._2, r._3 - r._1, r._4 - r._2))).map(GeomOps.area).sum
        assert(math.abs(got - expect) < 1e-5 * math.max(1, expect),
          s"seed $seed: union $got vs sweep $expect")
      }
    }
  }
}
