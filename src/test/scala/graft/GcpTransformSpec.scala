package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GeoTransform
import graft.raster.{GcpTransform, Warp}
import graft.raster.GcpTransform.Gcp
import graft.raster.Dem.DStrip

/** GCP polynomial (order 1/2/3) and thin-plate-spline transformers
  * (gdal_crs.c:170, gdal_tps.cpp:102).
  */
class GcpTransformSpec extends AnyFunSuite {

  private def rnd(seed: Int): Double =
    ((graft.sources.Pages.mix(seed.toLong) >>> 11) & 0xfffff).toDouble / 0xfffff

  test("polynomial fit reproduces exact polynomial data away from GCPs") {
    // pixel→geo maps of each order, GCPs on a grid, evaluation off-grid
    val maps: Seq[(Int, (Double, Double) => (Double, Double))] = Seq(
      1 -> ((p, l) => (3.0 + 2.5 * p - 0.3 * l, -7.0 + 0.2 * p + 1.8 * l)),
      2 -> ((p, l) => (1.0 + 2.0 * p + 0.1 * l + 0.03 * p * p - 0.02 * p * l,
                       5.0 + 1.5 * l - 0.2 * p + 0.01 * l * l)),
      3 -> ((p, l) => (0.5 + p + 0.2 * l + 0.01 * p * p + 0.001 * p * p * p,
                       1.5 + l + 0.1 * p + 0.02 * l * l - 0.0005 * l * l * l)))
    for ((order, f) <- maps) {
      val gcps = for (p <- 0 to 16 by 4; l <- 0 to 12 by 3) yield {
        val (gx, gy) = f(p.toDouble, l.toDouble); Gcp(p.toDouble, l.toDouble, gx, gy)
      }
      val fwd = GcpTransform.polyFwd(gcps, order)
      for (i <- 0 until 50) {
        val p = rnd(i * 2 + 1) * 16; val l = rnd(i * 2 + 2) * 12
        val (ex, ey) = f(p, l)
        val (gx, gy) = fwd(p, l)
        assert(math.abs(gx - ex) < 1e-7 && math.abs(gy - ey) < 1e-7,
          s"order $order at ($p,$l): got ($gx,$gy) want ($ex,$ey)")
      }
    }
  }

  test("polynomial fit is least-squares stable at UTM-sized coordinates") {
    // affine map with ~1e5..1e6 coords: normalization must keep order 3
    // exact despite x^3 ~ 1e18 in raw space
    val f: (Double, Double) => (Double, Double) =
      (p, l) => (500000.0 + 30.0 * p + 0.5 * l, 4100000.0 - 30.0 * l + 0.2 * p)
    val gcps = for (p <- 0 to 2000 by 400; l <- 0 to 1500 by 300) yield {
      val (gx, gy) = f(p.toDouble, l.toDouble); Gcp(p.toDouble, l.toDouble, gx, gy)
    }
    val inv = GcpTransform.polyTx(gcps, 3)
    for (i <- 0 until 20) {
      val p = rnd(i * 3 + 1) * 2000; val l = rnd(i * 3 + 2) * 1500
      val (gx, gy) = f(p, l)
      val (bp, bl) = inv(gx, gy)
      assert(math.abs(bp - p) < 1e-5 && math.abs(bl - l) < 1e-5,
        s"round trip at ($p,$l): got ($bp,$bl)")
    }
  }

  test("TPS interpolates exactly at the GCPs and reproduces affine globally") {
    // non-polynomial warp field: sin-perturbed — exact at GCPs is the TPS
    // contract; in between it is the minimum-bending interpolant
    val gcps = for (p <- 0 to 12 by 3; l <- 0 to 12 by 3) yield {
      val gx = 2.0 * p + math.sin(p * 0.7) + 0.3 * l
      val gy = 1.5 * l + math.cos(l * 0.5) - 0.1 * p
      Gcp(p.toDouble, l.toDouble, gx, gy)
    }
    val fwd = GcpTransform.tpsFwd(gcps)
    gcps.foreach { g =>
      val (gx, gy) = fwd(g.pixel, g.line)
      assert(math.abs(gx - g.geoX) < 1e-6 && math.abs(gy - g.geoY) < 1e-6,
        s"TPS must interpolate GCP ($g), got ($gx,$gy)")
    }
    // affine data → bending weights vanish → exact everywhere
    val affG = for (p <- 0 to 9 by 3; l <- 0 to 9 by 3)
      yield Gcp(p.toDouble, l.toDouble, 1.0 + 2.0 * p - 0.5 * l, -3.0 + 0.25 * p + 1.75 * l)
    val affT = GcpTransform.tpsFwd(affG)
    for (i <- 0 until 30) {
      val p = rnd(i * 5 + 1) * 9; val l = rnd(i * 5 + 2) * 9
      val (gx, gy) = affT(p, l)
      assert(math.abs(gx - (1.0 + 2.0 * p - 0.5 * l)) < 1e-7)
      assert(math.abs(gy - (-3.0 + 0.25 * p + 1.75 * l)) < 1e-7)
    }
  }

  test("validation: too few GCPs / degenerate GCPs fail loudly") {
    val three = Seq(Gcp(0, 0, 0, 0), Gcp(1, 0, 2, 0), Gcp(0, 1, 0, 2))
    intercept[IllegalArgumentException](GcpTransform.polyFwd(three, 2))
    // collinear GCPs cannot determine an order-1 map
    val collinear = Seq(Gcp(0, 0, 0, 0), Gcp(1, 1, 2, 2), Gcp(2, 2, 4, 4), Gcp(3, 3, 6, 6))
    intercept[IllegalArgumentException](GcpTransform.polyFwd(collinear, 1))
  }

  test("distributed GCP warp equals local (quadratic inverse map)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val sw = 12; val sh = 10
    val vals = Array.tabulate(sw * sh)(i => ((i % sw) * 31 + (i / sw) * 17) % 23 * 1.0)
    val strips = (0 until sh by 3).zipWithIndex.map { case (y0, idx) =>
      val hh = math.min(3, sh - y0)
      DStrip(idx, y0, hh, java.util.Arrays.copyOfRange(vals, y0 * sw, (y0 + hh) * sw))
    }.toDS()
    val quad: (Double, Double) => (Double, Double) = (gx, gy) =>
      (0.31 + 1.19 * gx + 0.031 * gy + 0.021 * gx * gx,
       0.13 + 1.17 * gy + 0.023 * gx + 0.017 * gy * gy)
    val gcps = for (gx <- 0 to 8 by 2; gy <- 0 to 6 by 2) yield {
      val (px, py) = quad(gx.toDouble, gy.toDouble)
      Gcp(px, py, gx.toDouble, gy.toDouble)
    }
    val tx = GcpTransform.polyTx(gcps, 2)
    val idGt = GeoTransform(0, 1, 0, 0, 0, 1)
    val dst = Warp.DstSpec(9, 8, GeoTransform.northUp(0, 8, 1, 1), stripHeight = 3)
    for (k <- Seq(Warp.Nearest, Warp.Bilinear)) {
      val expect = Warp.warpLocal(vals, sw, sh, idGt, dst, tx = tx, kernel = k, noData = -1)
      val got = Warp.warp(spark, strips, sw, sh, idGt, dst, tx = tx, kernel = k, noData = -1)
        .collect().sortBy(_.yOff).flatMap(_.vals)
      assert(got.toSeq === expect.toSeq, s"kernel $k")
    }
  }
}
