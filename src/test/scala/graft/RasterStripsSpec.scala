package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geom, GeoTransform, GLine, GPolygon}
import graft.raster._
import graft.raster.RasterStrips.{RasterSpec => RSpec, ShapeRow, ValueStrip}

/** Distributed strip execution matches the single-node kernels bit-for-bit
  * (checksums) / set-for-set (polygonize geometries).
  */
class RasterStripsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("distributed rasterize reproduces checksum 6452 across strip sizes") {
    val gt = GeoTransform(1000, 1, 0, 1100, 0, -1)
    val spec = RSpec(100, 100, 3, gt)
    val shapes = Seq(
      ShapeRow(0L, Geom.toWkb(Geom.fromWkt("POLYGON((1020 1030,1020 1045,1050 1045,1050 1030,1020 1030))")), Array(200.0, 220.0, 240.0)),
      ShapeRow(1L, Geom.toWkb(Geom.fromWkt("LINESTRING(1000 1000, 1100 1050)")), Array(200.0, 220.0, 240.0)))
    for (stripH <- Seq(7, 33, 100)) {
      val strips = RasterStrips.rasterize(spark, shapes.toDS(), spec,
        Rasterize.Options(), stripHeight0 = stripH)
      assert(RasterStrips.checksum(strips, spec, 1) === 6452, s"stripH=$stripH")
    }
  }

  test("distributed Z-burn reproduces checksum 15006 with strips") {
    val gt = GeoTransform(1000, 1, 0, 1100, 0, -1)
    val spec = RSpec(100, 100, 3, gt)
    val wkts = Seq(
      "POLYGON((1020 1030 40,1020 1045 30,1050 1045 20,1050 1030 35,1020 1030 40))",
      "POLYGON((1010 1046 85,1015 1055 35,1055 1060 26,1054 1048 35,1010 1046 85))",
      "POLYGON((1020 1076 190,1025 1085 35,1065 1090 26,1064 1078 35,1020 1076 190),(1023 1079 5,1061 1081 35,1062 1087 26,1028 1082 35,1023 1079 85))",
      "LINESTRING(1005 1000 10, 1100 1050 120)",
      "LINESTRING(1000 1000 150, 1095 1050 -5, 1080 1080 200)")
    val shapes = wkts.zipWithIndex.map { case (w, i) =>
      ShapeRow(i.toLong, Geom.toWkb(Geom.fromWkt(w)), Array(10.0, 10.0, 55.0))
    }
    val strips = RasterStrips.rasterize(spark, shapes.toDS(), spec,
      Rasterize.Options(burnValueFromZ = true), stripHeight0 = 13)
    assert(RasterStrips.checksum(strips, spec, 1) === 15006)
  }

  // ---- polygonize ----

  private val W = 5; private val H = 7
  private val grid = Array(
    107, 123, 132, 115, 132,
    115, 132, 132, 123, 123,
    115, 132, 140, 132, 123,
    148, 132, 123, 123, 123,
    156, 156, 156, 140, 132,
    156, 100, 156, 101, 102,
    156, 156, 156, 103, 103)
  private val gt = GeoTransform(440720, 60, 0, 3751440, 0, -60)

  /** Normalize a polygon for set comparison: each ring → set of unit
    * pixel-grid edges (collinear runs decomposed, orientation dropped).
    */
  private def normalize(p: GPolygon): Set[Set[(Int, Int, Int, Int)]] = {
    val inv = gt.inverse.get
    p.rings.map { r =>
      val edges = scala.collection.mutable.Set[(Int, Int, Int, Int)]()
      var i = 1
      while (i < r.numPoints) {
        var ax = math.round(inv.geoX(r.x(i - 1), r.y(i - 1))).toInt
        var ay = math.round(inv.geoY(r.x(i - 1), r.y(i - 1))).toInt
        val bx = math.round(inv.geoX(r.x(i), r.y(i))).toInt
        val by = math.round(inv.geoY(r.x(i), r.y(i))).toInt
        val sx = Integer.signum(bx - ax); val sy = Integer.signum(by - ay)
        while (ax != bx || ay != by) {
          val nx = ax + sx; val ny = ay + sy
          val e = if (ax < nx || (ax == nx && ay <= ny)) (ax, ay, nx, ny) else (nx, ny, ax, ay)
          edges += e
          ax = nx; ay = ny
        }
        i += 1
      }
      edges.toSet
    }.toSet
  }

  private def stripsOf(vals: Array[Int], stripH: Int): Seq[ValueStrip] = {
    (0 until H by stripH).zipWithIndex.map { case (y0, idx) =>
      val hh = math.min(stripH, H - y0)
      ValueStrip(idx, y0, hh, java.util.Arrays.copyOfRange(vals, y0 * W, (y0 + hh) * W))
    }
  }

  private def check(vals: Array[Int], conn: Int, stripH: Int): Unit = {
    val expected = Polygonize.polygonize(vals, W, H, conn, gt)
      .map { case (v, p) => (v, normalize(p)) }.toSet
    val got = RasterStrips.polygonize(spark, stripsOf(vals, stripH).toDS(), W, H, conn, gt)
      .collect()
      .map(r => (r.getInt(0), normalize(Geom.fromWkb(r.getAs[Array[Byte]](1)).asInstanceOf[GPolygon])))
      .toSet
    assert(got === expected, s"conn=$conn stripH=$stripH")
  }

  test("distributed polygonize matches single-node kernel (masked, 4-conn)") {
    val masked = grid.map(v => if (v == 132) Polygonize.NoDataMarker else v)
    for (stripH <- Seq(2, 3, 7)) check(masked, 4, stripH)
  }

  test("distributed polygonize matches single-node kernel (unmasked, 4+8 conn)") {
    for (conn <- Seq(4, 8); stripH <- Seq(2, 4, 7)) check(grid, conn, stripH)
  }
}
