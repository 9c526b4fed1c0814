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

  private val allKernels = Seq(Warp.Nearest, Warp.Bilinear, Warp.Cubic,
    Warp.CubicSpline, Warp.Lanczos, Warp.Average, Warp.Mode, Warp.Max,
    Warp.Min, Warp.Med, Warp.Q1, Warp.Q3)

  test("every kernel: distributed equals local on a scaled+shifted affine") {
    val dstGt = GeoTransform.northUp(9.4, 50.7, 0.77, 0.77)
    val dst = Warp.DstSpec(14, 11, dstGt, stripHeight = 4)
    for (k <- allKernels; stripH <- Seq(3, 16)) {
      val expect = Warp.warpLocal(vals, W, H, srcGt, dst, kernel = k, noData = -1)
      val got = Warp.warp(spark, strips(stripH), W, H, srcGt, dst, kernel = k, noData = -1)
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.toSeq === expect.toSeq, s"kernel $k stripH $stripH")
    }
  }

  test("interpolating kernels preserve a constant field exactly") {
    val const = Array.fill(W * H)(7.25)
    val cStrips = (0 until H by 5).zipWithIndex.map { case (y0, i) =>
      DStrip(i, y0, math.min(5, H - y0),
        java.util.Arrays.copyOfRange(const, y0 * W, (y0 + math.min(5, H - y0)) * W))
    }.toDS()
    // dst fully interior so no border/nodata pixels
    val dstGt = GeoTransform.northUp(12, 48, 0.43, 0.43)
    val dst = Warp.DstSpec(8, 7, dstGt, stripHeight = 3)
    for (k <- Seq(Warp.Bilinear, Warp.Cubic, Warp.CubicSpline, Warp.Lanczos,
        Warp.Average, Warp.Mode, Warp.Max, Warp.Min, Warp.Med)) {
      val got = Warp.warp(spark, cStrips, W, H, srcGt, dst, kernel = k, noData = -1)
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.forall(v => math.abs(v - 7.25) < 1e-9), s"kernel $k: ${got.toSeq.distinct}")
    }
  }

  test("aligned 2x average downscale equals exact block means") {
    // dst pixel (x,y) covers src 2x2 block exactly
    val dstGt = GeoTransform.northUp(10, 50, 1.0, 1.0)
    val dst = Warp.DstSpec(W / 2, H / 2, dstGt, stripHeight = 3)
    val got = Warp.warp(spark, strips(4), W, H, srcGt, dst, kernel = Warp.Average, noData = -1)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    for (y <- 0 until H / 2; x <- 0 until W / 2) {
      val mean = (vals(2 * y * W + 2 * x) + vals(2 * y * W + 2 * x + 1) +
        vals((2 * y + 1) * W + 2 * x) + vals((2 * y + 1) * W + 2 * x + 1)) / 4
      assert(math.abs(got(y * (W / 2) + x) - mean) < 1e-12, s"($x,$y)")
    }
  }

  test("cubic matches the closed-form Catmull-Rom on interior samples") {
    // 1-D ramp in x: cubic convolution must reproduce linear data exactly
    val ramp = Array.tabulate(W * H)(i => (i % W).toDouble)
    val rStrips = (0 until H by 5).zipWithIndex.map { case (y0, i) =>
      DStrip(i, y0, math.min(5, H - y0),
        java.util.Arrays.copyOfRange(ramp, y0 * W, (y0 + math.min(5, H - y0)) * W))
    }.toDS()
    val dstGt = GeoTransform.northUp(11, 49, 0.31, 0.31)
    val dst = Warp.DstSpec(10, 9, dstGt, stripHeight = 4)
    val got = Warp.warp(spark, rStrips, W, H, srcGt, dst, kernel = Warp.Cubic, noData = -1)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    val gotL = Warp.warp(spark, rStrips, W, H, srcGt, dst, kernel = Warp.Lanczos, noData = -1)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    for (y <- 0 until 9; x <- 0 until 10) {
      // src px of dst center: px = (11 + (x+0.5)*0.31 - 10) / 0.5
      val px = (11 + (x + 0.5) * 0.31 - 10) / 0.5
      val expect = px - 0.5 // ramp value at continuous center position
      assert(math.abs(got(y * 10 + x) - expect) < 1e-9, s"cubic ($x,$y)")
      assert(math.abs(gotL(y * 10 + x) - expect) < 0.08, s"lanczos ($x,$y)") // windowed sinc ripple
    }
  }

  test("srcNoData masking: holes drop out of every kernel") {
    // constant field with scattered holes: every masked kernel must return
    // the constant wherever ANY valid pixel contributes (weight
    // renormalization), and never let the hole value bleed in
    val hole = -9999.0
    val holed = Array.tabulate(W * H) { i =>
      if ((graft.sources.Pages.mix(i * 7 + 1) & 7) == 0) hole else 7.25
    }
    val hStrips = (0 until H by 5).zipWithIndex.map { case (y0, i) =>
      DStrip(i, y0, math.min(5, H - y0),
        java.util.Arrays.copyOfRange(holed, y0 * W, (y0 + math.min(5, H - y0)) * W))
    }.toDS()
    val dstGt = GeoTransform.northUp(10.1, 49.9, 0.43, 0.43)
    val dst = Warp.DstSpec(18, 14, dstGt, stripHeight = 5)
    for (k <- allKernels) {
      val got = Warp.warp(spark, hStrips, W, H, srcGt, dst, kernel = k,
          noData = -1.0, srcNoData = Some(hole))
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.forall(v => v == -1.0 || math.abs(v - 7.25) < 1e-9),
        s"kernel $k leaked the hole value: ${got.filterNot(v => v == -1.0 || math.abs(v - 7.25) < 1e-9).take(3).toSeq}")
      assert(got.exists(v => math.abs(v - 7.25) < 1e-9), s"kernel $k produced nothing")
      // distributed equals local with the mask on
      val expect = Warp.warpLocal(holed, W, H, srcGt, dst, kernel = k,
        noData = -1.0, srcNoData = Some(hole))
      assert(got.toSeq === expect.toSeq, s"kernel $k masked dist vs local")
    }
    // hole-free grid: masked and unmasked paths agree for every kernel on
    // an interior window (at the border, unmasked bilinear CLAMPS to edge
    // pixels while the masked path renormalizes — a legitimate divergence)
    val dstIn = Warp.DstSpec(16, 12, GeoTransform.northUp(11, 48.9, 0.4, 0.4), stripHeight = 5)
    for (k <- allKernels) {
      val masked = Warp.warpLocal(vals, W, H, srcGt, dstIn, kernel = k,
        noData = -1.0, srcNoData = Some(hole))
      val plain = Warp.warpLocal(vals, W, H, srcGt, dstIn, kernel = k, noData = -1.0)
      assert(masked.zip(plain).forall { case (a, b) => a == b || math.abs(a - b) < 1e-9 },
        s"kernel $k masked≠plain on hole-free input")
    }
    // all-hole source: everything is dst nodata
    val allHole = Array.fill(W * H)(hole)
    val gotAll = Warp.warpLocal(allHole, W, H, srcGt, dst, kernel = Warp.Bilinear,
      noData = -1.0, srcNoData = Some(hole))
    assert(gotAll.forall(_ == -1.0))
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
