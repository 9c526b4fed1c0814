package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Curves, GeomOps}

/** Curve geometry parity with `autotest/ogr/ogr_geom.py:2233-2275`. */
class CurvesSpec extends AnyFunSuite {
  private val inX = 1 + math.cos(math.Pi / 6) - 1e-4
  private val inY = math.sin(math.Pi / 6)
  private val outX = 1 + math.cos(math.Pi / 6) + 1e-4

  test("exact circle PIP is not discretization-dependent (45 deg steps)") {
    val circle = Curves.fromWkt("CURVEPOLYGON (CIRCULARSTRING (0 0,2 0,0 0))")
    assert(Curves.containsPoint(circle, inX, inY, stepDeg = 45.0))
    assert(!Curves.containsPoint(circle, outX, inY, stepDeg = 45.0))
  }

  test("full circle from two arcs, both orientations") {
    val g1 = Curves.fromWkt("CURVEPOLYGON (CIRCULARSTRING (0 0,1 1,2 0,1 -1,0 0))")
    assert(Curves.containsPoint(g1, inX, inY))
    val g2 = Curves.fromWkt("CURVEPOLYGON (CIRCULARSTRING (0 0,1 -1,2 0,1 1,0 0))")
    assert(Curves.containsPoint(g2, inX, inY))
  }

  test("out-and-back arc is not a circle") {
    val g = Curves.fromWkt("CURVEPOLYGON (CIRCULARSTRING (0 0,1 1,2 0,1 1,0 0))")
    assert(Curves.asFullCircle(g).isEmpty)
    val px = 1 + math.cos(math.Pi / 6) - 1e-2
    assert(!Curves.containsPoint(g, px, inY))
  }

  test("linearized circle area converges to pi r^2") {
    val circle = Curves.fromWkt("CURVEPOLYGON (CIRCULARSTRING (0 0,2 0,0 0))")
    val a4 = GeomOps.area(Curves.linearize(circle, 4.0))
    assert(math.abs(a4 - math.Pi) < 0.01, s"area $a4")
    val a45 = GeomOps.area(Curves.linearize(circle, 45.0))
    assert(a45 < a4 && a45 > 2.6, s"coarse area $a45") // inscribed polygon
  }

  test("compound curve linearizes with exact junctions; length sane") {
    val cc = Curves.fromWkt(
      "COMPOUNDCURVE(CIRCULARSTRING (0 0,1 1,2 0),(2 0,4 0))")
    val line = Curves.linearize(cc, 4.0).asInstanceOf[graft.core.GLine]
    assert(line.x(0) === 0.0 && line.y(0) === 0.0)
    assert(line.x(line.numPoints - 1) === 4.0)
    val len = GeomOps.length(line)
    assert(math.abs(len - (math.Pi + 2.0)) < 0.01, s"len $len") // half circle r=1 + segment
  }
}
