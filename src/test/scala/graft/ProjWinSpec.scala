package graft

import graft.core.GeoTransform
import graft.raster.Overview.IStrip
import graft.raster.Translate
import org.scalatest.funsuite.AnyFunSuite

/** gdal_translate -projwin parity (`apps/gdal_translate_lib.cpp:726,:877`). */
class ProjWinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val w = 20; private val h = 12
  private val vals = Array.tabulate(w * h)(i => (i % w) * 100 + (i / w))
  private val gt = GeoTransform.northUp(500.0, 900.0, 10.0, 10.0) // 10m px

  private def strips = {
    import spark.implicits._
    (0 until h by 4).zipWithIndex.map { case (y0, idx) =>
      IStrip(idx, y0, 4, w, java.util.Arrays.copyOfRange(vals, y0 * w, (y0 + 4) * w))
    }.toDS()
  }

  test("pixel-aligned projwin equals the integer srcwin") {
    // geo window [520,880]→[570,840] = src pixels x 2..7, y 2..6 (5×4)
    val (ds, ow, oh, outGt) = Translate.projWin(strips, w, h, gt, 520, 880, 570, 840)
    assert(ow === 5 && oh === 4)
    val out = ds.collect().sortBy(_.yOff).flatMap(_.vals)
    val expect = for (y <- 2 until 6; x <- 2 until 7) yield vals(y * w + x)
    assert(out.toSeq === expect)
    assert(outGt.gt0 === 520.0 && outGt.gt3 === 880.0)
    assert(outGt.gt1 === 10.0 && outGt.gt5 === -10.0)
  }

  test("fractional projwin: ceil(w-0.001) sizing + nearest centers") {
    // window 2.3..7.8 px wide (55 m starting at x=523): ow = ceil(5.5-.001)=6
    val (ds, ow, oh, _) = Translate.projWin(strips, w, h, gt, 523, 877, 578, 843)
    assert(ow === 6 && oh === 4)
    val out = ds.collect().sortBy(_.yOff).flatMap(_.vals)
    // dst center ox → src x = floor(2.3 + (ox+0.5)*5.5/6)
    val xs = (0 until 6).map(ox => math.floor(2.3 + (ox + 0.5) * 5.5 / 6).toInt)
    val ys = (0 until 4).map(oy => math.floor(2.3 + (oy + 0.5) * 3.4 / 4).toInt)
    val expect = for (y <- ys; x <- xs) yield vals(y * w + x)
    assert(out.toSeq === expect)
  }

  test("empty window throws like the reference's verify step") {
    intercept[IllegalArgumentException] {
      Translate.projWin(strips, w, h, gt, 570, 840, 520, 880) // inverted
    }
  }
}
