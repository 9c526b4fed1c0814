package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geom, GeomClip, GeomOps, GPolygon}

/** Boolean overlay semantics (the reference delegates to GEOS; these are
  * the area identities any correct overlay must satisfy).
  */
class GeomClipSpec extends AnyFunSuite {
  private def poly(wkt: String): GPolygon = Geom.fromWkt(wkt).asInstanceOf[GPolygon]
  private def areaOf(g: Option[Geom]): Double = g.map(GeomOps.area).getOrElse(0.0)

  private val a = poly("POLYGON((0 0,4 0,4 4,0 4,0 0))")
  private val b = poly("POLYGON((2 2,6 2,6 6,2 6,2 2))")

  test("crossing rectangles: all four ops satisfy the area identities") {
    assert(math.abs(areaOf(GeomClip.intersection(a, b)) - 4.0) < 1e-9)
    assert(math.abs(areaOf(GeomClip.union(a, b)) - 28.0) < 1e-9)
    assert(math.abs(areaOf(GeomClip.difference(a, b)) - 12.0) < 1e-9)
    assert(math.abs(areaOf(GeomClip.difference(b, a)) - 12.0) < 1e-9)
    assert(math.abs(areaOf(GeomClip.symDifference(a, b)) - 24.0) < 1e-9)
  }

  test("containment: intersection = inner, difference = ring with hole") {
    val inner = poly("POLYGON((1 1,3 1,3 3,1 3,1 1))")
    assert(math.abs(areaOf(GeomClip.intersection(a, inner)) - 4.0) < 1e-9)
    assert(math.abs(areaOf(GeomClip.union(a, inner)) - 16.0) < 1e-9)
    val diff = GeomClip.difference(a, inner)
    assert(math.abs(areaOf(diff) - 12.0) < 1e-9)
    assert(diff.get.asInstanceOf[GPolygon].rings.length === 2) // hole present
    assert(areaOf(GeomClip.difference(inner, a)) === 0.0)
  }

  test("disjoint: empty intersection, multi union, identity difference") {
    val far = poly("POLYGON((10 10,12 10,12 12,10 12,10 10))")
    assert(GeomClip.intersection(a, far).isEmpty)
    assert(math.abs(areaOf(GeomClip.union(a, far)) - 20.0) < 1e-9)
    assert(math.abs(areaOf(GeomClip.difference(a, far)) - 16.0) < 1e-9)
  }

  test("concave U-shape x rect: intersection splits into two pieces") {
    val u = poly("POLYGON((0 0,6 0,6 6,4 6,4 2,2 2,2 6,0 6,0 0))")
    val r = poly("POLYGON((1 3,5 3,5 5,1 5,1 3))")
    val inter = GeomClip.intersection(u, r)
    assert(math.abs(areaOf(inter) - 4.0) < 1e-9, s"got ${areaOf(inter)}")
    inter.get match {
      case graft.core.GMulti(6, gs) => assert(gs.length === 2)
      case other => fail(s"expected 2-piece multipolygon, got $other")
    }
    // U area = 36 − 8 (notch) = 28; minus the 4 units clipped by the rect
    assert(math.abs(areaOf(GeomClip.difference(u, r)) - (28.0 - 4.0)) < 1e-9)
  }

  test("shared-edge rectangles resolve by perturbation within tolerance") {
    val right = poly("POLYGON((4 0,8 0,8 4,4 4,4 0))")
    assert(areaOf(GeomClip.intersection(a, right)) < 1e-6)
    assert(math.abs(areaOf(GeomClip.union(a, right)) - 32.0) < 1e-6)
    assert(math.abs(areaOf(GeomClip.difference(a, right)) - 16.0) < 1e-6)
  }

  test("buffer: point → 32-gon circle, convex polygon → rounded offset") {
    val p = Geom.fromWkt("POINT(1 2)")
    val buf = GeomClip.buffer(p, 0.5)
    // area of the inscribed 32-gon: n/2 r² sin(2π/n)
    val expect = 32.0 / 2 * 0.25 * math.sin(2 * math.Pi / 32)
    assert(math.abs(GeomOps.area(buf) - expect) < 1e-9)
    val ring = buf.asInstanceOf[GPolygon].rings(0)
    assert(math.abs(ring.x(0) - 1.5) < 1e-12 && math.abs(ring.y(0) - 2.0) < 1e-12)
    // rect buffer: area = rect + perimeter·d + (approx) circle at corners
    val rect = poly("POLYGON((0 0,4 0,4 2,0 2,0 0))")
    val rb = GeomClip.buffer(rect, 1.0)
    val circleApprox = 32.0 / 2 * math.sin(2 * math.Pi / 32)
    val expectRect = 8.0 + 12.0 * 1.0 + circleApprox
    assert(math.abs(GeomOps.area(rb) - expectRect) < 0.05, s"got ${GeomOps.area(rb)}")
  }

  test("random rectangles: area identities hold pairwise") {
    for (seed <- 1 to 40) {
      val h = graft.sources.Pages.mix(seed.toLong)
      def f(k: Int): Double = ((h >>> (k * 8)) & 0x3f) / 4.0
      val (x1, y1, w1, h1) = (f(0), f(1), 1.0 + f(2) / 2, 1.0 + f(3) / 2)
      val (x2, y2, w2, h2) = (f(4) + 0.013, f(5) + 0.017, 1.0 + f(6) / 2, 1.0 + f(7) / 2)
      val p1 = poly(f"POLYGON(($x1%.3f $y1%.3f,${x1 + w1}%.3f $y1%.3f,${x1 + w1}%.3f ${y1 + h1}%.3f,$x1%.3f ${y1 + h1}%.3f,$x1%.3f $y1%.3f))")
      val p2 = poly(f"POLYGON(($x2%.3f $y2%.3f,${x2 + w2}%.3f $y2%.3f,${x2 + w2}%.3f ${y2 + h2}%.3f,$x2%.3f ${y2 + h2}%.3f,$x2%.3f $y2%.3f))")
      val expInter = math.max(0.0, math.min(x1 + w1, x2 + w2) - math.max(x1, x2)) *
        math.max(0.0, math.min(y1 + h1, y2 + h2) - math.max(y1, y2))
      val ai = areaOf(GeomClip.intersection(p1, p2))
      val au = areaOf(GeomClip.union(p1, p2))
      val ad = areaOf(GeomClip.difference(p1, p2))
      assert(math.abs(ai - expInter) < 1e-6, s"seed $seed inter: $ai vs $expInter")
      assert(math.abs(au - (w1 * h1 + w2 * h2 - expInter)) < 1e-6, s"seed $seed union")
      assert(math.abs(ad - (w1 * h1 - expInter)) < 1e-6, s"seed $seed diff")
    }
  }
}
