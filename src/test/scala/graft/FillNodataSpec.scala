package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Checksum, FillNodata}

/** FillNodata parity: the canonical byte.tif fixture (20×20, band checksum
  * 4672, `autotest/gcore/tiff_read.py:45`) passes through unchanged when
  * fully valid (`autotest/pyscripts/test_gdal_fillnodata.py:43`), and
  * quadrant interpolation fills holes per the reference formula.
  */
class FillNodataSpec extends AnyFunSuite {
  private val W = 20; private val H = 20
  private val byteTif: Array[Int] = Array(107,123,132,115,132,132,140,132,132,132,107,132,107,132,132,107,123,115,156,148,115,132,107,123,148,115,165,115,140,107,123,123,99,132,123,132,132,132,99,156,115,132,140,132,123,115,140,107,140,115,132,123,107,132,132,115,115,107,115,107,148,132,123,123,115,132,132,123,115,123,115,123,107,115,148,107,115,140,115,132,132,156,132,140,132,132,115,115,115,123,148,123,165,123,132,107,107,132,156,123,189,173,173,148,148,115,148,123,107,132,115,132,156,99,123,115,132,132,206,107,197,173,148,140,140,132,99,132,123,115,140,132,132,99,132,123,132,173,123,115,148,123,148,115,148,123,140,123,107,115,132,115,107,115,99,123,99,181,99,107,123,115,132,115,123,132,115,132,132,123,123,132,99,115,99,123,132,115,115,107,140,140,99,140,99,115,123,107,132,107,115,107,115,123,132,123,107,123,132,132,132,132,132,123,99,132,123,107,148,99,115,123,140,173,123,107,123,123,123,107,123,123,123,107,140,123,123,115,115,90,107,173,107,107,107,107,99,132,123,115,173,148,99,123,123,107,123,99,107,189,173,107,115,115,107,99,140,107,173,140,148,132,132,107,123,99,99,115,99,132,99,140,115,148,123,99,132,123,148,140,140,107,140,90,107,115,107,90,99,123,115,115,115,123,123,148,115,148,99,132,165,148,156,123,107,107,107,115,140,99,115,99,99,107,115,132,115,90,123,115,189,173,140,140,165,115,132,90,99,115,90,99,99,107,99,132,99,107,132,132,156,181,140,173,123,132,99,115,123,74,115,99,123,140,156,132,165,140,140,99,173,247,255,206,132,107,140,123,148,132,165,165,148,140,132,123,107,123,107,123,181,181,156,148,156,156,156,181,132,148,115,132,107,107,107,107,107,115,99,107)

  test("byte.tif is checksum 4672 and identity-fills with no nodata") {
    assert(Checksum.finish(Checksum.partialInt(byteTif, 0, byteTif.length, 0L)) === 4672)
    val vals = byteTif.map(_.toFloat)
    val filled = FillNodata.fill(vals, Array.fill(W * H)(true), W, H)
    assert(filled.toSeq === vals.toSeq)
    val asInt = filled.map(v => graft.raster.Translate.toByte(v.toDouble))
    assert(Checksum.finish(Checksum.partialInt(asInt, 0, asInt.length, 0L)) === 4672)
  }

  test("single hole fills with inverse-distance of quadrant neighbors") {
    // constant raster: hole must fill to the constant exactly
    val const = Array.fill(25)(42.0f)
    val valid = Array.fill(25)(true)
    valid(12) = false
    val filled = FillNodata.fill(const, valid, 5, 5)
    assert(filled(12) === 42.0f)
    // gradient raster: filled value stays within neighbor bounds
    val grad = Array.tabulate(25)(i => (i % 5 * 10 + i / 5).toFloat)
    val f2 = FillNodata.fill(grad, valid, 5, 5)
    assert(f2(12) > grad(11) - 10 && f2(12) < grad(13) + 10)
    // exact quadrant hits for the hole at (2,2), grid v = x*10+y:
    // TL=(2,1) v=21 d=1; BL=(2,3) v=23 d=1; TR=(3,2) v=32 d=1;
    // BR=(3,3) v=33 d=√2 → IDW = (21+23+32+33/√2)/(3+1/√2)
    val expect = (21.0 + 23.0 + 32.0 + 33.0 / math.sqrt(2)) / (3.0 + 1.0 / math.sqrt(2))
    assert(math.abs(f2(12) - expect) < 1e-4, s"got ${f2(12)}, expect $expect")
  }

  test("unreachable holes (beyond maxSearchDist) stay unchanged") {
    val vals = Array.fill(100)(7.0f)
    val valid = Array.fill(100)(false)
    valid(0) = true
    vals(55) = -99.0f
    val filled = FillNodata.fill(vals, valid, 10, 10, maxSearchDist0 = 2.0)
    assert(filled(55) === -99.0f) // nearest valid is ~7 px away
  }
}
