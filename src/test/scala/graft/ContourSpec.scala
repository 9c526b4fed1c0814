package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GeoTransform
import graft.raster.Contour

/** Contour parity with `/root/reference/autotest/alg/contour.py:43-129`:
  * concentric plateaus at 0/10/20/25 → two contour lines (levels 10, 20)
  * whose envelopes match the expected rectangles within half a pixel.
  */
class ContourSpec extends AnyFunSuite {

  test("contour_1: two closed contours with expected envelopes") {
    val size = 160
    val precision = 1.0 / size
    val vals = Array.fill(size * size)(0.0)
    for (y <- 40 until 120; x <- 40 until 120) vals(y * size + x) = 10.0
    for (y <- 60 until 100; x <- 60 until 100) vals(y * size + x) = 20.0
    for (y <- 70 until 90; x <- 70 until 90) vals(y * size + x) = 25.0
    val gt = GeoTransform(1, precision, 0, 50, 0, -precision)

    val result = Contour.contourLines(vals, size, size, gt,
      levels = Seq(10.0, 20.0), interval = 10.0)

    val expected = Map(
      10.0 -> (1.25, 1.75, 49.25, 49.75),
      20.0 -> (1.375, 1.625, 49.375, 49.625))

    for ((level, (minx, maxx, miny, maxy)) <- expected) {
      val lines = result(level)
      assert(lines.size === 1, s"level $level should stitch into one ring, got ${lines.size}")
      val l = lines.head
      assert(l.isClosed, s"level $level contour should close")
      val env = l.envelope
      val tol = precision / 2 * 1.001
      assert(math.abs(env.minX - minx) <= tol, s"level $level minX ${env.minX}")
      assert(math.abs(env.maxX - maxx) <= tol, s"level $level maxX ${env.maxX}")
      assert(math.abs(env.minY - miny) <= tol, s"level $level minY ${env.minY}")
      assert(math.abs(env.maxY - maxy) <= tol, s"level $level maxY ${env.maxY}")
    }
    // level 0 (all samples fudged above) and 30 (above max) produce nothing
    val empty = Contour.contourLines(vals, size, size, gt, Seq(0.0, 30.0), 10.0)
    assert(empty(0.0).isEmpty && empty(30.0).isEmpty)
  }
}
