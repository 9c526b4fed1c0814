package graft

import graft.raster.Overview
import graft.raster.Overview.CStrip
import org.scalatest.funsuite.AnyFunSuite

/** AVERAGE_MAGPHASE complex overview — `gcore/overview.cpp:1867` parity. */
class ComplexOverviewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("magnitude is preserved as the block-average of magnitudes") {
    // four unit vectors at 0°, 90°, 180°, 270°: vector sum ≈ 0, but the
    // output magnitude must be the AVERAGE magnitude (1.0)... the vector
    // sum is exactly 0 here so ratio can't apply; use a slightly
    // asymmetric block instead so m != 0
    val re = Array(1.0f, 0.0f, -0.5f, 0.0f)
    val im = Array(0.0f, 1.0f, 0.0f, -1.0f)
    val s = CStrip(0, 0, 2, 2, re, im)
    val o = Overview.downsampleComplexMagPhase(s)
    val mags = (0 until 4).map(i => math.hypot(re(i), im(i)))
    val outM = math.hypot(o.re(0), o.im(0))
    assert(math.abs(outM - mags.sum / 4) < 1e-6,
      s"out magnitude $outM vs mean ${mags.sum / 4}")
    // phase follows the vector average direction: sum = (0.5, 0) → 0°
    assert(o.im(0) === 0.0f)
    assert(o.re(0) > 0)
  }

  test("zero vector sum stays zero (reference ratio guard)") {
    val re = Array(1.0f, -1.0f, 1.0f, -1.0f)
    val im = Array(1.0f, -1.0f, -1.0f, 1.0f)
    val o = Overview.downsampleComplexMagPhase(CStrip(0, 0, 2, 2, re, im))
    assert(o.re(0) === 0.0f && o.im(0) === 0.0f)
  }

  test("distributed level matches local kernel on every strip") {
    import spark.implicits._
    val w = 16; val h = 8
    val re = Array.tabulate(w * h)(i => ((i * 37) % 23 - 11).toFloat / 3f)
    val im = Array.tabulate(w * h)(i => ((i * 53) % 19 - 9).toFloat / 4f)
    val strips = (0 until h by 4).zipWithIndex.map { case (y0, idx) =>
      CStrip(idx, y0, 4, w,
        java.util.Arrays.copyOfRange(re, y0 * w, (y0 + 4) * w),
        java.util.Arrays.copyOfRange(im, y0 * w, (y0 + 4) * w))
    }
    val dist = Overview.levelComplexMagPhase(strips.toDS())
      .collect().sortBy(_.yOff)
    val local = strips.map(Overview.downsampleComplexMagPhase)
    dist.zip(local).foreach { case (d, l) =>
      assert(java.util.Arrays.equals(d.re, l.re) &&
        java.util.Arrays.equals(d.im, l.im), s"strip ${d.stripIdx}")
    }
    // edge column (odd width handled): re-run with w=15
    val s15 = CStrip(0, 0, 4, 15,
      java.util.Arrays.copyOfRange(re, 0, 60), java.util.Arrays.copyOfRange(im, 0, 60))
    val o15 = Overview.downsampleComplexMagPhase(s15)
    assert(o15.width === 8 && o15.height === 2)
  }
}
