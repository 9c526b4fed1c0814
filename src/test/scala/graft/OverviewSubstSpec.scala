package graft

import graft.raster.Overview
import graft.raster.Overview.IStrip
import org.scalatest.funsuite.AnyFunSuite

/** Overview (pyramid) substitution — SURVEY §4 #14, reference
  * `gcore/rasterio.cpp:2486` GDALBandGetBestOverviewLevel2.
  */
class OverviewSubstSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("level selection matches the reference 1.2x rule") {
    val levels = Seq((500, 500), (250, 250), (125, 125)) // res 2, 4, 8
    def pick(buf: Int) =
      Overview.bestOverviewLevel(1000, 1000, levels, 1000, 1000, buf, buf)
    assert(pick(900) === -1) // desired 1.11: res 2 ≥ 1.33 → base
    assert(pick(500) === 0)  // desired 2.0: res 2 < 2.4 ✓
    assert(pick(400) === 0)  // desired 2.5: res 4 ≥ 3.0 → level 0
    assert(pick(260) === 1)  // desired 3.85: res 4 < 4.62 ✓
    assert(pick(100) === 2)  // desired 10: res 8 < 12 ✓
    assert(pick(30) === 2)   // beyond the pyramid: deepest level
    // least-reduced-axis rule: X barely reduced → desired stays small
    assert(Overview.bestOverviewLevel(1000, 1000, levels, 1000, 1000, 900, 100) === -1)
  }

  test("decimated read is served from the pyramid and stays accurate") {
    import spark.implicits._
    val w = 64; val h = 64
    // smooth field so AVERAGE overviews stay close to point samples
    val vals = Array.tabulate(w * h)(i => (i % w) + (i / w))
    val base = (0 until h by 16).zipWithIndex.map { case (y0, idx) =>
      IStrip(idx, y0, 16, w, java.util.Arrays.copyOfRange(vals, y0 * w, (y0 + 16) * w))
    }.toDS()
    val lvl1 = Overview.level(base, Overview.Average)
    val lvl2 = Overview.level(lvl1, Overview.Average)
    val pyramid = Seq((lvl1, 32, 32), (lvl2, 16, 16))

    // 16×16 request (desired 4.0) → level 1 (res 4 < 4.8)
    val (out, used) = Overview.resizeWithPyramid(base, w, h, pyramid, 16, 16)
    assert(used === 1)
    val px = out.collect().sortBy(_.yOff).flatMap(_.vals)
    assert(px.length === 256)
    // AVERAGE level-2 pixel (x,y) covers base 4×4 block: value ≈
    // (4x+1.5)+(4y+1.5); nearest resize of the 16×16 level is identity
    for (y <- 0 until 16; x <- 0 until 16) {
      val expect = (4 * x + 1.5) + (4 * y + 1.5)
      assert(math.abs(px(y * 16 + x) - expect) <= 2.0,
        s"($x,$y) got ${px(y * 16 + x)} expect ~$expect")
    }

    // full-res request reads the base exactly
    val (outBase, usedBase) = Overview.resizeWithPyramid(base, w, h, pyramid, w, h)
    assert(usedBase === -1)
    assert(outBase.collect().sortBy(_.yOff).flatMap(_.vals).toSeq === vals.toSeq)
  }
}
