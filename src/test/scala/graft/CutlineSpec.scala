package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GLine, GPolygon, GeoTransform, GeomOps, GPoint}
import graft.raster.{Cutline, Warp}
import graft.raster.Dem.DStrip

/** Warp cutline masking: hard center-rule clip, feathered blend, crop. */
class CutlineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val W = 20; private val H = 16
  private val gt = GeoTransform.northUp(0, 16, 1, 1)
  private def ring(pts: (Double, Double)*): GPolygon =
    GPolygon(Array(GLine((pts :+ pts.head).flatMap(p => Seq(p._1, p._2)).toArray)))

  private def constStrips(v: Double) = (0 until H by 5).zipWithIndex.map { case (y0, i) =>
    DStrip(i, y0, math.min(5, H - y0), Array.fill(math.min(5, H - y0) * W)(v))
  }.toDS()

  test("hard cutline equals the pixel-center point-in-polygon rule") {
    val poly = ring((3.3, 2.2), (16.8, 4.1), (14.2, 13.7), (5.1, 12.3))
    val dst = Warp.DstSpec(W, H, gt, stripHeight = 5)
    val got = Cutline(constStrips(9.0), dst, poly, noData = -1.0)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    for (y <- 0 until H; x <- 0 until W) {
      val gx = gt.geoX(x + 0.5, y + 0.5); val gy = gt.geoY(x + 0.5, y + 0.5)
      val inside = GeomOps.containsPoint(poly, gx, gy)
      val v = got(y * W + x)
      assert(if (inside) v == 9.0 else v == -1.0,
        s"($x,$y) center ($gx,$gy) inside=$inside got $v")
    }
  }

  test("blend: far-inside keeps the value, far-outside is nodata, ramp is monotone") {
    val poly = ring((4.0, 3.0), (16.0, 3.0), (16.0, 13.0), (4.0, 13.0))
    val dst = Warp.DstSpec(W, H, gt, stripHeight = 7)
    val got = Cutline(constStrips(8.0), dst, poly, noData = 0.0, blendPx = 2.0)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    @inline def at(x: Int, y: Int): Double = got(y * W + x)
    assert(at(10, 8) === 8.0)        // deep inside
    assert(at(0, 0) === 0.0)         // far outside
    assert(at(10, 3) > 0.0 && at(10, 3) < 8.0) // half a px inside the top edge
    // walking inward across the top edge: density non-decreasing
    val col = (1 to 6).map(y => at(10, y))
    assert(col.zip(col.tail).forall { case (a, b) => a <= b }, col.toString)
    // one exact value: row y=2 center gy=13.5, 0.5 px OUTSIDE the top edge
    // → density 0.5 − 0.5/4 = 0.375 → 8·0.375 = 3.0
    assert(math.abs(at(10, 2) - 3.0) < 1e-9, s"got ${at(10, 2)}")
  }

  test("cropToCutline snaps the grid outward to the resolution") {
    val poly = ring((2.3, 1.7), (9.4, 1.7), (9.4, 8.2), (2.3, 8.2))
    val d1 = Cutline.cropToCutline(poly, 1, 1)
    assert(d1.width === 8 && d1.height === 8)
    assert(d1.gt.gt0 === 2.0 && d1.gt.gt3 === 9.0)
    val half = Cutline.cropToCutline(poly, 0.5, 0.5)
    assert(half.gt.gt0 === 2.0 && half.gt.gt3 === 8.5)
    assert(half.width === 15 && half.height === 14)
  }
}
