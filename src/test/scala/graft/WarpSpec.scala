package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GeoTransform
import graft.raster.{Warp, Dem}
import graft.raster.Dem.DStrip

class WarpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val W = 20; private val H = 16
  private val vals = Array.tabulate(W * H)(i => ((graft.sources.Pages.mix(i) & 0xff) / 4.0))
  private val srcGt = GeoTransform.northUp(10, 50, 0.5, 0.5)

  private def strips(stripH: Int) = (0 until H by stripH).zipWithIndex.map { case (y0, i) =>
    DStrip(i, y0, math.min(stripH, H - y0),
      java.util.Arrays.copyOfRange(vals, y0 * W, (y0 + math.min(stripH, H - y0)) * W))
  }.toDS()

  test("identity warp reproduces the source for both kernels") {
    val dst = Warp.DstSpec(W, H, srcGt, stripHeight = 5)
    for (k <- Seq(Warp.Nearest, Warp.Bilinear)) {
      val got = Warp.warp(spark, strips(4), W, H, srcGt, dst, kernel = k)
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.toSeq === vals.toSeq, s"kernel $k")
    }
  }

  test("distributed warp equals local reference for scaled+shifted affine") {
    // dst: half resolution, shifted origin, partially outside the source
    val dstGt = GeoTransform.northUp(9, 51, 1.0, 1.0)
    val dst = Warp.DstSpec(15, 12, dstGt, stripHeight = 5)
    for (k <- Seq(Warp.Nearest, Warp.Bilinear)) {
      val expect = Warp.warpLocal(vals, W, H, srcGt, dst, kernel = k, noData = -1)
      val got = Warp.warp(spark, strips(3), W, H, srcGt, dst, kernel = k, noData = -1)
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.toSeq === expect.toSeq, s"kernel $k")
    }
  }

  test("reprojection warp 4326->3857 equals local reference") {
    // src in lon/lat; dst in WebMercator covering the same area
    val xm0 = graft.expr.GeoRt.lonToMercX(10)
    val xm1 = graft.expr.GeoRt.lonToMercX(20)
    val ym0 = graft.expr.GeoRt.latToMercY(42)
    val ym1 = graft.expr.GeoRt.latToMercY(50)
    val dstGt = GeoTransform.northUp(xm0, ym1, (xm1 - xm0) / 24, (ym1 - ym0) / 20)
    val dst = Warp.DstSpec(24, 20, dstGt, stripHeight = 6)
    for (k <- Seq(Warp.Nearest, Warp.Bilinear)) {
      val expect = Warp.warpLocal(vals, W, H, srcGt, dst, Warp.mercToLonLat, k, noData = -1)
      val got = Warp.warp(spark, strips(4), W, H, srcGt, dst, Warp.mercToLonLat, k, noData = -1)
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.toSeq === expect.toSeq, s"kernel $k")
      assert(got.count(_ != -1) > got.length / 2, "most pixels should map inside")
    }
  }
}
