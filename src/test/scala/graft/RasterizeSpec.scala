package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geom, GeoTransform}
import graft.raster.{Checksum, Rasterize}
import graft.raster.Rasterize.{Options, Shape}

/** Golden-checksum parity with the reference rasterize suite
  * (`/root/reference/autotest/alg/rasterize.py`).
  */
class RasterizeSpec extends AnyFunSuite {

  private def cs(data: Array[Byte], w: Int, h: Int, band: Int): Int =
    Checksum.ofByteBand(data, w, h, band)

  test("rasterize_1: polygon + line burn, checksum 6452 (rasterize.py:92)") {
    val gt = GeoTransform(1000, 1, 0, 1100, 0, -1)
    val shapes = Seq(
      Shape(Geom.fromWkt("POLYGON((1020 1030,1020 1045,1050 1045,1050 1030,1020 1030))"),
        Array(200.0, 220.0, 240.0)),
      Shape(Geom.fromWkt("LINESTRING(1000 1000, 1100 1050)"),
        Array(200.0, 220.0, 240.0)))
    // bands [3,2,1] with burn [200,220,240] — band index 1 of the buffer
    // (second requested band = band 2 of the dataset) gets 220.
    val data = Rasterize.rasterizeByte(100, 100, 3, gt, shapes, Options())
    // dataset band 2 = requested list position 1
    assert(cs(data, 100, 100, 1) === 6452)
  }

  test("rasterize_2: ALL_TOUCHED cutline, checksum 121 (rasterize.py:137)") {
    val gt = GeoTransform(0, 1, 0, 12, 0, -1)
    val wkts = Seq(
      "POLYGON((6.25 1.25,7.25 1.25,7.25 2.25,6.25 2.25,6.25 1.25))",
      "POLYGON((4.25 4.25,6.25 4.25,6.25 6.25,4.25 6.25,4.25 4.25))",
      "POLYGON((1.001 1.001,3.999 3.999,3.2 1.6,1.001 1.001))")
    val shapes = wkts.map(w => Shape(Geom.fromWkt(w), Array(200.0, 220.0, 240.0)))
    val data = Rasterize.rasterizeByte(12, 12, 3, gt, shapes, Options(allTouched = true))
    assert(cs(data, 12, 12, 1) === 121)
  }

  private val zShapeWkts = Seq(
    "POLYGON((1020 1030 40,1020 1045 30,1050 1045 20,1050 1030 35,1020 1030 40))",
    "POLYGON((1010 1046 85,1015 1055 35,1055 1060 26,1054 1048 35,1010 1046 85))",
    "POLYGON((1020 1076 190,1025 1085 35,1065 1090 26,1064 1078 35,1020 1076 190),(1023 1079 5,1061 1081 35,1062 1087 26,1028 1082 35,1023 1079 85))",
    "LINESTRING(1005 1000 10, 1100 1050 120)",
    "LINESTRING(1000 1000 150, 1095 1050 -5, 1080 1080 200)")

  test("rasterize_3: BURN_VALUE_FROM=Z, checksum 15006 (rasterize.py:193)") {
    val gt = GeoTransform(1000, 1, 0, 1100, 0, -1)
    val shapes = zShapeWkts.map(w => Shape(Geom.fromWkt(w), Array(10.0, 10.0, 55.0)))
    val data = Rasterize.rasterizeByte(100, 100, 3, gt, shapes, Options(burnValueFromZ = true))
    assert(cs(data, 100, 100, 1) === 15006)
  }

  test("rasterize_4: ATTRIBUTE burn, checksum 16265 (rasterize.py:251)") {
    val gt = GeoTransform(1000, 1, 0, 1100, 0, -1)
    val celsius = Seq(50.0, 255.0, 60.0, 100.0, 180.0)
    val shapes = zShapeWkts.zip(celsius).map { case (w, c) =>
      Shape(Geom.fromWkt(w), Array(c, c, c))
    }
    val data = Rasterize.rasterizeByte(100, 100, 3, gt, shapes, Options())
    assert(cs(data, 100, 100, 1) === 16265)
  }

  test("checksum distributed combine matches whole-image checksum") {
    // strip partials with phase offsets must combine to the full checksum
    val rnd = new scala.util.Random(7)
    val w = 37; val h = 23
    val img = Array.fill(w * h)((rnd.nextInt(256) - 64).toByte)
    val whole = Checksum.finish(Checksum.partialByte(img, 0, w * h, 0L))
    val stripH = 5
    var sum = 0L
    var y = 0
    while (y < h) {
      val rows = math.min(stripH, h - y)
      sum += Checksum.partialByte(img, y * w, rows * w, y.toLong * w)
      y += rows
    }
    assert(Checksum.finish(sum) === whole)
  }
}
