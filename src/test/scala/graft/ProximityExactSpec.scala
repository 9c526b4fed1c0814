package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Checksum, Proximity, Translate}

/** Golden parity with the reference proximity tests
  * (`/root/reference/autotest/alg/proximity.py:55,:89`); input raster is
  * autotest/alg/data/pat.tif (25×25 byte, uncompressed, extracted).
  */
class ProximityExactSpec extends AnyFunSuite {
  private val W = 25; private val H = 25
  private val pat: Array[Int] = Array(255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,64,64,64,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,64,64,64,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,64,64,64,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,0,0,0,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,0,0,0,0,0,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,255,255,255,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0)

  test("proximity_1: default options -> byte checksum 1941") {
    val prox = Proximity.proximityExact(pat, W, H)
    // dst band is GDT_Byte: float->byte via GDALCopyWords rounding
    val bytes = prox.map(v => Translate.toByte(v.toDouble))
    assert(Checksum.finish(Checksum.partialInt(bytes, 0, bytes.length, 0L)) === 1941)
  }

  test("proximity_2: VALUES/MAXDIST/NODATA/FIXED_BUF_VAL -> float checksum 3256") {
    val prox = Proximity.proximityExact(pat, W, H, targetValues = Seq(65, 64),
      maxDist0 = 12.0, noData = -1.0f, fixedBufVal = Some(255.0))
    val d = prox.map(_.toDouble)
    assert(Checksum.finish(Checksum.partialDouble(d, 0, d.length, 0L)) === 3256)
  }
}
