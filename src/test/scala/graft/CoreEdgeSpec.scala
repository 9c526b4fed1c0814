package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Edge-case regressions from the round-4 core review: hole-aware polygon
  * containment, spherical equal-area projections, collapsed-CW-ring
  * dissolve, Z/M-preserving simplify, empty-geometry behavior across
  * centroid / distance / WKT round-trip / GeoJSON null geometry.
  */
class CoreEdgeSpec extends AnyFunSuite {

  private def wkt(s: String): Geom = Geom.fromWkt(s)

  test("contains: a hole of the container strictly inside the containee") {
    val holed = wkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
    val over = wkt("POLYGON((3 3,7 3,7 7,3 7,3 3))") // encloses the hole
    val clear = wkt("POLYGON((1 1,3 1,3 3,1 3,1 1))") // misses the hole
    assert(!GeomOps.contains(holed, over),
      "hole interior is not part of the container")
    assert(GeomOps.contains(holed, clear))
    // crossing case (hole boundary crosses b) still rejected
    val cross = wkt("POLYGON((5 5,8 5,8 8,5 8,5 5))")
    assert(!GeomOps.contains(holed, cross))
  }

  test("spherical LAEA/AEA: no NaN (EASE-Grid style sphere)") {
    val sph = SrsParse.parse("+proj=laea +a=6371228 +b=6371228 +lat_0=90 +lon_0=0")
    val (x, y) = Proj.transformPoint(Proj.byEpsg(4326).get, sph, 45.0, 60.0)
    assert(!x.isNaN && !y.isNaN)
    // round-trip
    val (lon, lat) = Proj.transformPoint(sph, Proj.byEpsg(4326).get, x, y)
    assert(math.abs(lon - 45.0) < 1e-9 && math.abs(lat - 60.0) < 1e-9)
    // q = 2 sin(phi) limit: spherical radius at the pole = R*sqrt(2)
    val (x0, y0) = Proj.transformPoint(Proj.byEpsg(4326).get, sph, 0.0, 0.0)
    assert(math.abs(math.hypot(x0, y0) - 6371228.0 * math.sqrt(2.0)) < 1e-3)
    val aea = SrsParse.parse("+proj=aea +a=6370997 +b=6370997 +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96")
    val (ax, ay) = Proj.transformPoint(Proj.byEpsg(4326).get, aea, -75.0, 40.0)
    assert(!ax.isNaN && !ay.isNaN)
  }

  test("unionCascaded: CW-wound collapsed exterior is resurrected") {
    val big = wkt("POLYGON((0 0,100000 0,100000 100000,0 100000,0 0))")
      .asInstanceOf[GPolygon]
    // 1 mm square far from the big polygon but with overlapping envelope
    // forced via a sliver... simpler: overlapping envelopes through union-
    // find requires intersecting envs; place the tiny square just outside
    // the big one but let a thin bridge polygon connect the envelopes.
    def sq(x0: Double, y0: Double, s: Double, cw: Boolean): GPolygon = {
      val pts =
        if (!cw) Array(x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s, x0, y0)
        else Array(x0, y0, x0, y0 + s, x0 + s, y0 + s, x0 + s, y0, x0, y0)
      GPolygon(Array(GLine(pts)))
    }
    // envelope of the tiny CW square overlaps the big polygon's envelope
    // (sits just inside the top-right corner area but OUTSIDE the big
    // polygon is impossible for a convex square...) — instead use a
    // tiny square overlapping the envelope but outside the polygon is
    // impossible; so verify area conservation instead: the tiny square
    // inside the big one must not change the union, and a CW tiny square
    // NEXT TO the big one (disjoint envelopes → own component) survives.
    val tinyCwInside = sq(50000, 50000, 1e-4, cw = true)
    val u1 = Arrangement.unionCascaded(Seq(big, tinyCwInside))
    assert(math.abs(u1.map(GeomOps.area).sum - 1e10) < 1)
    val tinyCwOutside = sq(200000, 200000, 1e-4, cw = true)
    val u2 = Arrangement.unionCascaded(Seq(big, tinyCwOutside))
    // the separated CW-wound square is its own component and survives
    assert(u2.length == 2,
      s"expected big + resurrected tiny, got ${u2.length} polygons")
  }

  test("simplify and simplifyPreserveTopology carry Z and M") {
    val l = GLine(Array(0, 0, 1, 0.001, 2, 0, 3, 5, 4, 0),
      z = Array(5, 6, 7, 8, 9), m = Array(50, 60, 70, 80, 90))
    val s = GeomBuild.simplify(l, 0.01).asInstanceOf[GLine]
    assert(s.z != null && s.m != null)
    assert(s.numPoints < 5 && s.z.length == s.numPoints)
    assert(s.z(0) == 5.0 && s.z(s.numPoints - 1) == 9.0)
    assert(s.m(0) == 50.0 && s.m(s.numPoints - 1) == 90.0)
    val pt = GeomBuild.simplifyPreserveTopology(l, 0.01).asInstanceOf[GLine]
    assert(pt.z != null && pt.z.length == pt.numPoints)
    // closed ring keeps the duplicated closing Z
    val ring = GLine(Array(0, 0, 4, 0, 4, 4, 2, 4.0001, 0, 4, 0, 0),
      z = Array(1, 2, 3, 4, 5, 1))
    val rs = GeomBuild.simplifyPreserveTopology(GPolygon(Array(ring)), 0.01)
      .asInstanceOf[GPolygon].rings(0)
    assert(rs.z != null && rs.z(0) == rs.z(rs.numPoints - 1))
  }

  test("empty geometries: centroid, distance, WKT round-trip") {
    val emptyPoly = wkt("POLYGON EMPTY")
    val (cx, cy) = GeomOps.centroid(emptyPoly)
    assert(cx.isNaN && cy.isNaN)
    val emptyColl = wkt("GEOMETRYCOLLECTION EMPTY")
    assert(GeomOps.distance(emptyColl, GPoint(0, 0)).isNaN)
    assert(GeomOps.distance(GPoint(0, 0), emptyPoly).isNaN)
    // WKT writes the EMPTY keyword and round-trips through its own parser
    for (w <- Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
      "MULTIPOLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY")) {
      val out = Geom.toWkt(wkt(w))
      assert(out == w, s"$w -> $out")
      Geom.fromWkt(out) // parses back without throwing
    }
  }

  test("GeoJSON Feature with null geometry") {
    val g = GeoJson.fromJson("""{"type":"Feature","geometry":null,"properties":{"a":1}}""")
    assert(g.isInstanceOf[GMulti] && g.asInstanceOf[GMulti].geoms.isEmpty)
  }

  test("polygon contains: hole with all vertices ON the contained boundary") {
    // p2 = unit-10 square; p1 = larger square with a DIAMOND hole whose
    // four vertices sit exactly on p2's boundary edges but whose edges dip
    // through p2's interior — vertex sampling alone reports contains=true
    def ring(pts: (Double, Double)*): GLine =
      GLine(pts.flatMap(p => Seq(p._1, p._2)).toArray)
    val p2 = GPolygon(Array(ring((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))))
    val holed = GPolygon(Array(
      ring((-5, -5), (15, -5), (15, 15), (-5, 15), (-5, -5)),
      ring((5, 0), (0, 5), (5, 10), (10, 5), (5, 0)))) // CW hole
    assert(!GeomOps.contains(holed, p2),
      "diamond hole dips through p2's interior — containment must fail")
    // control: same outer, hole fully outside p2 — contains holds
    val awayHole = GPolygon(Array(
      ring((-5, -5), (15, -5), (15, 15), (-5, 15), (-5, -5)),
      ring((-4, -4), (-4, -1), (-1, -1), (-1, -4), (-4, -4))))
    assert(GeomOps.contains(awayHole, p2))
    // a hole whose vertices AND edge midpoints are all outside p2 but
    // whose long edge passes straight through p2's interior — only the
    // proper-crossing detector sees it
    val throughHole = GPolygon(Array(
      ring((-40, -40), (40, -40), (40, 40), (-40, 40), (-40, -40)),
      ring((-30, 5), (30, 5), (30, 6), (-30, 6), (-30, 5))))
    assert(!GeomOps.contains(throughHole, p2),
      "hole edge passing through p2's interior must disprove containment")
  }
}
