package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class GeoJsonGmlSpec extends AnyFunSuite {

  private val wkts = Seq(
    "POINT(1.5 2)",
    "LINESTRING(0 0,3 4,7 1)",
    "POLYGON((0 0,6 0,6 6,0 6,0 0))",
    "POLYGON((0 0,6 0,6 6,0 6,0 0),(2 2,4 2,4 4,2 4,2 2))",
    "MULTIPOINT(0 0,1 1)",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))")

  test("GeoJSON roundtrip preserves WKT") {
    wkts.foreach { w =>
      val g = Geom.fromWkt(w)
      val back = GeoJson.fromJson(GeoJson.toJson(g))
      assert(Geom.toWkt(back) === Geom.toWkt(g), s"roundtrip $w")
    }
  }

  test("GeoJSON literal output convention") {
    assert(GeoJson.toJson(Geom.fromWkt("POINT(1.5 2)")) ===
      """{"type":"Point","coordinates":[1.5,2.0]}""")
    assert(GeoJson.toJson(Geom.fromWkt("POLYGON((0 0,2 0,2 2,0 2,0 0))")) ===
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,2.0],[0.0,0.0]]]}""")
  }

  test("GeoJSON accepts whitespace and foreign keys") {
    val g = GeoJson.fromJson(
      """ { "bbox": [0, 0, 2, 2], "type" : "Polygon",
        |   "coordinates" : [ [ [0,0], [2,0], [2,2], [0,2], [0,0] ] ] } """.stripMargin)
    assert(math.abs(GeomOps.area(g.asInstanceOf[GPolygon]) - 4.0) < 1e-12)
  }

  test("GeoJSON carries Z") {
    val g = GeoJson.fromJson("""{"type":"LineString","coordinates":[[0,0,5],[1,1,7]]}""")
    val l = g.asInstanceOf[GLine]
    assert(l.z != null && l.z(0) === 5.0 && l.z(1) === 7.0)
    assert(GeoJson.toJson(g).contains("[0.0,0.0,5.0]"))
  }

  test("GML roundtrip preserves WKT") {
    wkts.foreach { w =>
      val g = Geom.fromWkt(w)
      val back = Gml.fromGml(Gml.toGml(g))
      assert(Geom.toWkt(back) === Geom.toWkt(g), s"roundtrip $w")
    }
  }

  test("GML2 literal output and GML3 posList input") {
    assert(Gml.toGml(Geom.fromWkt("POINT(1.5 2)")) ===
      "<gml:Point><gml:coordinates>1.5,2</gml:coordinates></gml:Point>")
    // GML3-style exterior/posList with srsDimension
    val g3 = Gml.fromGml(
      """<gml:Polygon><gml:exterior><gml:LinearRing>
        |<gml:posList srsDimension="2">0 0 4 0 4 4 0 4 0 0</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon>""".stripMargin)
    assert(math.abs(GeomOps.area(g3.asInstanceOf[GPolygon]) - 16.0) < 1e-12)
    val p3 = Gml.fromGml("""<gml:Point><gml:pos>2.5 3.5</gml:pos></gml:Point>""")
    assert(p3.asInstanceOf[GPoint].x === 2.5 && p3.asInstanceOf[GPoint].y === 3.5)
  }

  test("GeoJSON skips null/bool foreign members (RFC 7946 legal)") {
    val g = GeoJson.fromJson(
      """{"type":"Point","coordinates":[1,2],"crs":null,"lucky":true}""")
    assert(g.asInstanceOf[GPoint].x === 1.0)
  }

  test("Feature and FeatureCollection wrappers unwrap to geometries") {
    val f = GeoJson.fromJson(
      """{"type":"Feature","properties":{"name":"x","n":3},
        | "geometry":{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}}""".stripMargin)
    assert(math.abs(GeomOps.area(f.asInstanceOf[GPolygon]) - 4.0) < 1e-12)
    val fc = GeoJson.fromJson(
      """{"type":"FeatureCollection","features":[
        | {"type":"Feature","properties":null,"geometry":{"type":"Point","coordinates":[1,2]}},
        | {"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[3,4]}}]}""".stripMargin)
    val gs = fc.asInstanceOf[GMulti].geoms
    assert(gs.length === 2 && gs(1).asInstanceOf[GPoint].x === 3.0)
  }

  test("st_centroid matches the area-weighted formula") {
    val spark = SparkTestBase.spark
    gf.registerAll(spark)
    // L-shape: centroid of (4x1 ∪ 1x3 stacked) =
    // (4*0.5*(2,0.5) + 3*(0.5,2.5)) / 7
    val r = spark.sql(
      """select st_x(st_centroid(g)) x, st_y(st_centroid(g)) y from
        |(select st_geomfromtext('POLYGON((0 0,4 0,4 1,1 1,1 4,0 4,0 0))') g)""".stripMargin)
      .head()
    val ex = (4 * 2.0 + 3 * 0.5) / 7
    val ey = (4 * 0.5 + 3 * 2.5) / 7
    assert(math.abs(r.getDouble(0) - ex) < 1e-12 && math.abs(r.getDouble(1) - ey) < 1e-12)
  }

  test("GML3 Surface/patches and Curve/segments parse") {
    val surf = Gml.fromGml(
      """<gml:Surface><gml:patches><gml:PolygonPatch><gml:exterior>
        |<gml:LinearRing><gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:PolygonPatch></gml:patches></gml:Surface>""".stripMargin)
    assert(math.abs(GeomOps.area(surf.asInstanceOf[GPolygon]) - 16.0) < 1e-12)
    val curve = Gml.fromGml(
      """<gml:Curve><gml:segments>
        |<gml:LineStringSegment><gml:posList>0 0 1 0</gml:posList></gml:LineStringSegment>
        |<gml:LineStringSegment><gml:posList>1 0 1 3</gml:posList></gml:LineStringSegment>
        |</gml:segments></gml:Curve>""".stripMargin)
    assert(curve.asInstanceOf[GLine].numPoints === 4)
  }

  test("GML polygon with hole keeps ring roles") {
    val holed = Geom.fromWkt("POLYGON((0 0,6 0,6 6,0 6,0 0),(2 2,4 2,4 4,2 4,2 2))")
    val gml = Gml.toGml(holed)
    assert(gml.contains("outerBoundaryIs") && gml.contains("innerBoundaryIs"))
    val back = Gml.fromGml(gml).asInstanceOf[GPolygon]
    assert(back.rings.length === 2)
    assert(math.abs(GeomOps.area(back) - 32.0) < 1e-12)
  }
}
