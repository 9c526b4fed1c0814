package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.Rpc

/** RPC transformer: term-order parity, forward closed forms, inverse
  * round trip, height sensitivity.
  */
class RpcSpec extends AnyFunSuite {

  private def coef(pairs: (Int, Double)*): Array[Double] = {
    val a = new Array[Double](20); pairs.foreach { case (i, v) => a(i) = v }; a
  }

  // affine-in-normalized-space model: px = (0.1 + L + 0.2P)·10 + 100 + 0.5
  private val affine = Rpc.Model(
    lineOff = 200, lineScale = 20, sampOff = 100, sampScale = 10,
    latOff = 30, latScale = 2, longOff = -90, longScale = 3,
    heightOff = 500, heightScale = 100,
    lineNum = coef(0 -> 0.05, 2 -> 1.0, 1 -> -0.1),
    lineDen = coef(0 -> 1.0),
    sampNum = coef(0 -> 0.1, 1 -> 1.0, 2 -> 0.2),
    sampDen = coef(0 -> 1.0))

  test("forward matches the closed form (affine numerators, unit denominators)") {
    for (lon <- Seq(-91.0, -90.0, -88.5); lat <- Seq(29.0, 30.0, 31.7)) {
      val l = (lon + 90.0) / 3.0; val p = (lat - 30.0) / 2.0
      val (px, py) = Rpc.forward(affine, lon, lat, 500.0)
      assert(math.abs(px - ((0.1 + l + 0.2 * p) * 10 + 100 + 0.5)) < 1e-12)
      assert(math.abs(py - ((0.05 + p - 0.1 * l) * 20 + 200 + 0.5)) < 1e-12)
    }
  }

  test("term order parity: cubic/cross terms land in the reference slots") {
    // put a coefficient on term 14 (L²P per gdal_rpc.cpp RPCComputeTerms)
    // and verify the forward value moves by exactly c·L²P·scale
    val base = affine
    val bumped = base.copy(sampNum = {
      val c = base.sampNum.clone(); c(14) = 0.5; c
    })
    val lon = -88.0; val lat = 32.0
    val l = (lon + 90.0) / 3.0; val p = (lat - 30.0) / 2.0
    val (px0, _) = Rpc.forward(base, lon, lat, 500.0)
    val (px1, _) = Rpc.forward(bumped, lon, lat, 500.0)
    assert(math.abs((px1 - px0) - 0.5 * l * l * p * 10.0) < 1e-10)
  }

  test("inverse round-trips through a rational (non-affine) model") {
    val rational = affine.copy(
      sampNum = coef(0 -> 0.01, 1 -> 1.0, 2 -> 0.05, 4 -> 0.02, 7 -> 0.01),
      sampDen = coef(0 -> 1.0, 2 -> 0.01, 1 -> 0.004),
      lineNum = coef(0 -> 0.02, 2 -> 0.9, 1 -> 0.03, 8 -> -0.005),
      lineDen = coef(0 -> 1.0, 1 -> 0.005))
    for (lon <- Seq(-92.0, -90.0, -87.4); lat <- Seq(28.5, 30.0, 32.2); h <- Seq(400.0, 500.0)) {
      val (px, py) = Rpc.forward(rational, lon, lat, h)
      val (blon, blat) = Rpc.inverse(rational, px, py, h, tolPx = 1e-11)
      assert(math.abs(blon - lon) < 1e-9 && math.abs(blat - lat) < 1e-9,
        s"round trip at ($lon,$lat,$h): got ($blon,$blat)")
    }
  }

  test("height matters: the model shifts with h through the H terms") {
    val withH = affine.copy(sampNum = coef(0 -> 0.1, 1 -> 1.0, 2 -> 0.2, 3 -> 0.3))
    val (pxLo, _) = Rpc.forward(withH, -90.0, 30.0, 500.0)
    val (pxHi, _) = Rpc.forward(withH, -90.0, 30.0, 600.0)
    assert(math.abs((pxHi - pxLo) - 0.3 * 1.0 * 10.0) < 1e-12) // ΔH_norm = 1
  }
}
