package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geom, GeoTransform}
import graft.raster.Polygonize

/** Fixture parity with `/root/reference/autotest/alg/polygonize.py`
  * (grid `autotest/alg/data/polygonize_in.grd`, 5×7, nodata 132).
  */
class PolygonizeSpec extends AnyFunSuite {

  private val W = 5
  private val H = 7
  private val grid = Array(
    107, 123, 132, 115, 132,
    115, 132, 132, 123, 123,
    115, 132, 140, 132, 123,
    148, 132, 123, 123, 123,
    156, 156, 156, 140, 132,
    156, 100, 156, 101, 102,
    156, 156, 156, 103, 103)
  private val gt = GeoTransform(440720, 60, 0, 3751440, 0, -60)

  private def masked: Array[Int] =
    grid.map(v => if (v == 132) Polygonize.NoDataMarker else v)

  test("polygonize_1: 13 features with expected DN order and DN=156 hole WKT") {
    val res = Polygonize.polygonize(masked, W, H, 4, gt)
    assert(res.map(_._1) ===
      Vector(107, 123, 115, 115, 140, 148, 123, 140, 156, 100, 101, 102, 103))
    val p156 = res.find(_._1 == 156).get._2
    assert(Geom.toWkt(p156) ===
      "POLYGON ((440720 3751200,440720 3751020,440900 3751020,440900 3751200,440720 3751200),(440780 3751140,440840 3751140,440840 3751080,440780 3751080,440780 3751140))")
  }

  test("polygonize_2: 17 features without masking") {
    val res = Polygonize.polygonize(grid, W, H, 4, gt)
    assert(res.map(_._1) ===
      Vector(107, 123, 115, 132, 115, 132, 140, 132, 148, 123, 140, 132, 156,
             100, 101, 102, 103))
  }

  test("polygonize_4: 16 features 8-connected") {
    val res = Polygonize.polygonize(grid, W, H, 8, gt)
    assert(res.map(_._1) ===
      Vector(107, 123, 132, 115, 132, 115, 140, 148, 123, 140, 132, 156,
             100, 101, 102, 103))
  }
}
