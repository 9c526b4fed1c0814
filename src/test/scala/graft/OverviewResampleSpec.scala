package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Overview, Warp}
import graft.raster.Overview.IStrip

/** GAUSS + convolution overview levels: distributed == local port,
  * constant invariance (GDALRegenerateOverviews resampler family,
  * overview.cpp:521 Gauss / :~2030 convolution).
  */
class OverviewResampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val W = 21; private val H = 18
  private val vals = Array.tabulate(W * H)(i => (graft.sources.Pages.mix(i) & 0xff).toInt)

  private def strips(stripH: Int) = (0 until H by stripH).zipWithIndex.map { case (y0, i) =>
    IStrip(i, y0, math.min(stripH, H - y0), W,
      java.util.Arrays.copyOfRange(vals, y0 * W, (y0 + math.min(stripH, H - y0)) * W))
  }.toDS()

  test("distributed Gauss level equals the local port on every layout") {
    val (expect, ow, oh) = Overview.gaussLocal(vals, W, H)
    for (stripH <- Seq(2, 4, 6, 18)) {
      val got = Overview.levelGauss(spark, strips(stripH), W, H)
        .collect().sortBy(_.yOff)
      assert(got.map(_.width).distinct.toSeq === Seq(ow))
      assert(got.map(_.height).sum === oh)
      assert(got.flatMap(_.vals).toSeq === expect.toSeq, s"stripH=$stripH")
    }
  }

  test("Gauss of a constant raster is the constant") {
    val const = Array.fill(W * H)(91)
    val s = (0 until H by 4).zipWithIndex.map { case (y0, i) =>
      IStrip(i, y0, math.min(4, H - y0), W,
        java.util.Arrays.copyOfRange(const, y0 * W, (y0 + math.min(4, H - y0)) * W))
    }.toDS()
    val got = Overview.levelGauss(spark, s, W, H).collect().flatMap(_.vals)
    assert(got.forall(_ == 91))
  }

  test("convolution levels (cubic/spline/lanczos) preserve constants") {
    val const = Array.fill(W * H)(137)
    val s = (0 until H by 6).zipWithIndex.map { case (y0, i) =>
      IStrip(i, y0, math.min(6, H - y0), W,
        java.util.Arrays.copyOfRange(const, y0 * W, (y0 + math.min(6, H - y0)) * W))
    }.toDS()
    for (k <- Seq(Warp.Cubic, Warp.CubicSpline, Warp.Lanczos)) {
      val got = Overview.levelConvolution(spark, s, W, H, k).collect()
        .sortBy(_.yOff).flatMap(_.vals)
      assert(got.length === ((W + 1) / 2) * ((H + 1) / 2))
      assert(got.forall(_ == 137), s"kernel $k: ${got.distinct.toSeq}")
    }
  }
}
