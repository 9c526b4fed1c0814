package graft

import graft.core.{GeoTransform, Proj}
import graft.raster.{Dem, Warp}
import org.scalatest.funsuite.AnyFunSuite

class WarpApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("approxRow: few exact evaluations, bounded deviation (UTM row)") {
    // dst row in EPSG:32631 meters, src in 4326 quarter-degree pixels
    val dstGt = GeoTransform.northUp(500000.0, 5530000.0, 100.0, 100.0)
    val srcGt = GeoTransform.northUp(3.0, 50.0, 0.25, 0.25)
    val srcInv = srcGt.inverse.get
    var calls = 0
    val baseTx = Warp.epsgTx(32631, 4326)
    val countingTx: Warp.GeoTx = (x, y) => { calls += 1; baseTx(x, y) }
    val w = 4096
    val (ax, ay) = Warp.approxRow(w, 7, dstGt, countingTx, srcInv, tol = 0.125)
    assert(calls < w / 8, s"approx used $calls exact calls for $w pixels")
    // deviation vs the exact transform stays within the tolerance (plus
    // fp slack)
    var worst = 0.0
    var c = 0
    while (c < w) {
      val gx = dstGt.geoX(c + 0.5, 7.5); val gy = dstGt.geoY(c + 0.5, 7.5)
      val (sx, sy) = baseTx(gx, gy)
      val ex = srcInv.geoX(sx, sy); val ey = srcInv.geoY(sx, sy)
      worst = math.max(worst, math.max(math.abs(ax(c) - ex), math.abs(ay(c) - ey)))
      c += 200
    }
    assert(worst <= 0.125 + 1e-9, s"worst deviation $worst")
  }

  test("approx warp is exact-identical for an affine transform") {
    import spark.implicits._
    // affine pairs are globally linear: the top-level midpoint test passes
    // and interpolation reproduces the transform, so outputs must match
    val sw = 15; val sh = 13
    val vals = Array.tabulate(sw * sh)(i => ((i % sw) * 31 + (i / sw) * 17) % 23 * 1.0)
    val srcGt = GeoTransform.northUp(0, sh, 1, 1)
    val dstGt = GeoTransform.northUp(-0.4, sh + 0.3, 0.73, 0.61)
    def strips = (0 until sh by 4).zipWithIndex.map { case (y0, idx) =>
      Dem.DStrip(idx, y0, math.min(4, sh - y0),
        java.util.Arrays.copyOfRange(vals, y0 * sw, (y0 + math.min(4, sh - y0)) * sw))
    }.toDS()
    for (k <- Seq[Warp.Kernel](Warp.Nearest, Warp.Bilinear, Warp.Cubic)) {
      val spec = Warp.DstSpec(18, 20, dstGt, stripHeight = 5)
      val exact = Warp.warp(spark, strips, sw, sh, srcGt, spec, kernel = k, noData = -1)
        .collect().sortBy(_.stripIdx).flatMap(_.vals)
      val approx = Warp.warp(spark, strips, sw, sh, srcGt, spec, kernel = k,
        noData = -1, approxTol = 0.125)
        .collect().sortBy(_.stripIdx).flatMap(_.vals)
      if (k == Warp.Nearest)
        assert(java.util.Arrays.equals(exact, approx), s"kernel $k affine mismatch")
      else // interpolated coords differ from direct evaluation by ulps
        exact.zip(approx).foreach { case (e, a) =>
          assert(math.abs(e - a) < 1e-9, s"kernel $k affine mismatch $e vs $a") }
    }
  }

  test("approx UTM warp bilinear stays within the gradient bound") {
    import spark.implicits._
    val sw = 20; val sh = 20
    val vals = Array.tabulate(sw * sh)(i => ((i % sw) * 31 + (i / sw) * 17) % 23 * 1.0)
    val srcGt = GeoTransform.northUp(3.0, 50.0, 0.25, 0.25)
    val dstGt = GeoTransform.northUp(500000.0, 5530000.0, 25000.0, 25000.0)
    def strips = (0 until sh by 5).zipWithIndex.map { case (y0, idx) =>
      Dem.DStrip(idx, y0, 5, java.util.Arrays.copyOfRange(vals, y0 * sw, (y0 + 5) * sw))
    }.toDS()
    val spec = Warp.DstSpec(14, 20, dstGt, stripHeight = 6)
    val tx = Warp.epsgTx(32631, 4326)
    val exact = Warp.warp(spark, strips, sw, sh, srcGt, spec, tx,
      kernel = Warp.Bilinear, noData = -1)
      .collect().sortBy(_.stripIdx).flatMap(_.vals)
    val approx = Warp.warp(spark, strips, sw, sh, srcGt, spec, tx,
      kernel = Warp.Bilinear, noData = -1, approxTol = 0.01)
      .collect().sortBy(_.stripIdx).flatMap(_.vals)
    // value field changes by ≤ 22 between adjacent cells (mod-23 ramp), so
    // a ≤0.01 px coordinate error moves bilinear output by ≤ ~0.5
    exact.zip(approx).zipWithIndex.foreach { case ((e, a), i) =>
      assert(math.abs(e - a) <= 0.5, s"pixel $i exact $e approx $a")
    }
  }
}
