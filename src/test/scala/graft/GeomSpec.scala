package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fixtures.PolyFixture

class GeomSpec extends AnyFunSuite {

  test("WKT parse/write round-trip for all kinds") {
    val wkts = Seq(
      "POINT (1 2)",
      "POINT (1.5 -2.25 7)",
      "LINESTRING (0 0,1 1,2 0)",
      "POLYGON ((0 0,10 0,10 10,0 10,0 0))",
      "POLYGON ((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))",
      "MULTIPOINT ((1 1),(2 2))",
      "MULTILINESTRING ((0 0,1 1),(2 2,3 3))",
      "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,1 1))"
    )
    for (w <- wkts) {
      val g = Geom.fromWkt(w)
      assert(Geom.toWkt(g) == w, s"round trip of $w")
    }
  }

  test("WKB round-trip preserves geometry incl. Z") {
    val wkts = Seq(
      "POINT (1 2)",
      "LINESTRING (1005 1000 10,1100 1050 120)",
      "POLYGON ((1020 1030 40,1020 1045 30,1050 1045 20,1050 1030 35,1020 1030 40))",
      "MULTIPOLYGON (((0 0,1 0,1 1,0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 2 3))"
    )
    for (w <- wkts) {
      val g = Geom.fromWkt(w)
      val g2 = Geom.fromWkb(Geom.toWkb(g))
      assert(Geom.toWkt(g2) == Geom.toWkt(g), s"wkb round trip of $w")
    }
  }

  test("point-in-ring: unit square (reference ray-cast semantics)") {
    val sq = Geom.fromWkt("POLYGON ((0 0,10 0,10 10,0 10,0 0))").asInstanceOf[GPolygon]
    assert(GeomOps.polygonContainsPoint(sq, 5, 5))
    assert(!GeomOps.polygonContainsPoint(sq, 15, 5))
    assert(!GeomOps.polygonContainsPoint(sq, -1, 5))
    // boundary points intersect but may not be "contained" (ray-cast edge rule)
    assert(GeomOps.intersectsPoint(sq, 0, 5))
    assert(GeomOps.intersectsPoint(sq, 10, 10))
    assert(GeomOps.intersectsPoint(sq, 5, 0))
  }

  test("point-in-polygon with hole (donut)") {
    val donut = Geom.fromWkt(
      "POLYGON ((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))").asInstanceOf[GPolygon]
    assert(GeomOps.polygonContainsPoint(donut, 1, 1))   // in shell
    assert(!GeomOps.polygonContainsPoint(donut, 5, 5))  // in hole
    assert(!GeomOps.polygonContainsPoint(donut, 12, 5)) // outside
    assert(GeomOps.polygonContainsPoint(donut, 2.5, 5)) // between shell and hole
  }

  test("multipolygon containment") {
    val mp = Geom.fromWkt("MULTIPOLYGON (((0 0,2 0,2 2,0 2,0 0)),((5 5,7 5,7 7,5 7,5 5)))")
    assert(GeomOps.containsPoint(mp, 1, 1))
    assert(GeomOps.containsPoint(mp, 6, 6))
    assert(!GeomOps.containsPoint(mp, 3.5, 3.5))
  }

  test("shoelace area matches poly.shp AREA attribute within 0.15") {
    // poly.shp stores an AREA column computed by the original GIS; our
    // shoelace must agree closely (values are planar square meters).
    for (r <- PolyFixture.rows) {
      val g = Geom.fromWkt(r.wkt)
      val a = GeomOps.area(g)
      assert(math.abs(a - r.area) / r.area < 0.002, s"eas_id=${r.easId}: got $a want ~${r.area}")
    }
  }

  test("area of polygon with hole subtracts the hole") {
    val donut = Geom.fromWkt("POLYGON ((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))")
    assert(math.abs(GeomOps.area(donut) - (100.0 - 16.0)) < 1e-12)
  }

  test("length, distance, centroid") {
    val l = Geom.fromWkt("LINESTRING (0 0,3 4)")
    assert(GeomOps.length(l) == 5.0)
    val p1 = Geom.fromWkt("POINT (0 0)")
    val p2 = Geom.fromWkt("POINT (3 4)")
    assert(GeomOps.distance(p1, p2) == 5.0)
    val sq = Geom.fromWkt("POLYGON ((0 0,10 0,10 10,0 10,0 0))")
    val (cx, cy) = GeomOps.centroid(sq)
    assert(math.abs(cx - 5) < 1e-12 && math.abs(cy - 5) < 1e-12)
    // point to polygon distance
    assert(GeomOps.distance(Geom.fromWkt("POINT (15 10)"), sq) == 5.0)
    assert(GeomOps.distance(Geom.fromWkt("POINT (5 5)"), sq) == 0.0)
  }

  test("intersects: polygon/polygon, line/polygon, envelope reject") {
    val a = Geom.fromWkt("POLYGON ((0 0,10 0,10 10,0 10,0 0))")
    val b = Geom.fromWkt("POLYGON ((5 5,15 5,15 15,5 15,5 5))")
    val c = Geom.fromWkt("POLYGON ((20 20,30 20,30 30,20 30,20 20))")
    val inner = Geom.fromWkt("POLYGON ((2 2,4 2,4 4,2 4,2 2))")
    assert(GeomOps.intersects(a, b))
    assert(!GeomOps.intersects(a, c))
    assert(GeomOps.intersects(a, inner)) // full containment
    assert(GeomOps.intersects(inner, a))
    val line = Geom.fromWkt("LINESTRING (-5 5,25 5)")
    assert(GeomOps.intersects(a, line))
    assert(!GeomOps.intersects(c, line))
    assert(GeomOps.contains(a, inner))
    assert(!GeomOps.contains(inner, a))
  }

  test("geotransform fwd/inverse (GDAL convention)") {
    val gt = GeoTransform(1000, 1, 0, 1100, 0, -1)
    assert(gt.applyFwd(0, 0) == ((1000.0, 1100.0)))
    assert(gt.applyFwd(50, 70) == ((1050.0, 1030.0)))
    val (px, ln) = gt.toPixel(1050.0, 1030.0)
    assert(math.abs(px - 50) < 1e-12 && math.abs(ln - 70) < 1e-12)
  }
}
