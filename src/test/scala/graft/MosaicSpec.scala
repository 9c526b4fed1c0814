package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GeoTransform
import graft.raster.{Mosaic, Warp}
import graft.raster.Dem.DStrip

/** Multi-source mosaic: source order, nodata transparency, warp reuse. */
class MosaicSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def stripsOf(w: Int, h: Int, stripH: Int, f: (Int, Int) => Double) =
    (0 until h by stripH).zipWithIndex.map { case (y0, idx) =>
      val hh = math.min(stripH, h - y0)
      DStrip(idx, y0, hh, Array.tabulate(hh * w)(i => f(i % w, y0 + i / w)))
    }.toDS()

  test("later sources overwrite where valid; nodata stays transparent") {
    // three stacked constant layers on the same grid: 1 everywhere,
    // 2 with a transparent (nodata=9) hole, 3 only in a corner
    val gt = GeoTransform.northUp(0, 8, 1, 1)
    val l1 = Mosaic.Source(stripsOf(10, 8, 3, (_, _) => 1.0), 10, 8, gt)
    val l2 = Mosaic.Source(stripsOf(10, 8, 3,
      (x, y) => if (x >= 3 && x < 6 && y >= 3 && y < 6) 9.0 else 2.0), 10, 8, gt,
      srcNoData = Some(9.0))
    val l3 = Mosaic.Source(stripsOf(4, 3, 2, (_, _) => 3.0), 4, 3,
      GeoTransform.northUp(0, 8, 1, 1))
    val dst = Warp.DstSpec(10, 8, gt, stripHeight = 3)
    val out = Mosaic(spark, Seq(l1, l2, l3), dst, noData = -1.0)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    for (y <- 0 until 8; x <- 0 until 10) {
      val expect =
        if (x < 4 && y < 3) 3.0                                  // top layer corner
        else if (x >= 3 && x < 6 && y >= 3 && y < 6) 1.0         // l2 hole → l1 shows
        else 2.0                                                 // l2 everywhere else
      assert(out(y * 10 + x) === expect, s"($x,$y)")
    }
  }

  test("single-source mosaic equals a plain warp") {
    val gt = GeoTransform.northUp(10, 50, 0.5, 0.5)
    val vals = Array.tabulate(20 * 16)(i => ((graft.sources.Pages.mix(i) & 0xff) / 4.0))
    val src = stripsOf(20, 16, 5, (x, y) => vals(y * 20 + x))
    val dst = Warp.DstSpec(14, 11, GeoTransform.northUp(9.4, 50.7, 0.77, 0.77), stripHeight = 4)
    val plain = Warp.warp(spark, src, 20, 16, gt, dst, kernel = Warp.Bilinear, noData = -1.0)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    val mos = Mosaic(spark, Seq(Mosaic.Source(src, 20, 16, gt)), dst,
      kernel = Warp.Bilinear, noData = -1.0)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    assert(mos.toSeq === plain.toSeq)
  }
}
