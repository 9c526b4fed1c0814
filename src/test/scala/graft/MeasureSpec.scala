package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** M / ZM coordinate variants (wkbHasM, `gdal/ogr/ogr_core.h:468`). */
class MeasureSpec extends AnyFunSuite {

  private val cases = Seq(
    "POINT M (1 2 7)",
    "POINT ZM (1 2 3 7)",
    "LINESTRING M (0 0 1,2 0 2,2 2 3)",
    "LINESTRING ZM (0 0 5 1,2 0 6 2)",
    "POLYGON M ((0 0 1,4 0 2,4 4 3,0 4 4,0 0 1))",
    "MULTIPOINT M ((0 0 1),(1 1 2))",
    "MULTILINESTRING ZM ((0 0 1 2,1 1 3 4))")

  test("WKT M/ZM roundtrip") {
    cases.foreach { w =>
      val g = Geom.fromWkt(w)
      assert(g.hasM, s"$w must parse as measured")
      assert(Geom.toWkt(g) === w, s"WKT roundtrip $w")
    }
  }

  test("WKB M/ZM roundtrip with ISO type codes") {
    cases.foreach { w =>
      val g = Geom.fromWkt(w)
      val wkb = Geom.toWkb(g)
      // ISO code range: 2000+ (M) or 3000+ (ZM), little endian at byte 1
      val code = java.nio.ByteBuffer.wrap(wkb, 1, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      assert(code >= 2001 && code <= 3007, s"$w ISO code $code")
      assert(Geom.toWkt(Geom.fromWkb(wkb)) === w, s"WKB roundtrip $w")
    }
  }

  test("unmarked 4-number WKT parses as XYZM") {
    val g = Geom.fromWkt("LINESTRING(0 0 5 1,2 0 6 2)")
    assert(g.hasZ && g.hasM)
    assert(Geom.toWkt(g) === "LINESTRING ZM (0 0 5 1,2 0 6 2)")
  }

  test("pre-M encodings are byte-stable") {
    // XY and classic 2.5D XYZ must keep the legacy OGC layout
    val xy = Geom.toWkb(Geom.fromWkt("POINT (3 4)"))
    assert(java.nio.ByteBuffer.wrap(xy, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt === 1)
    val xyz = Geom.toWkb(Geom.fromWkt("POINT (3 4 5)"))
    assert(java.nio.ByteBuffer.wrap(xyz, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt === (1 | 0x80000000))
    assert(Geom.toWkt(Geom.fromWkb(xyz)) === "POINT (3 4 5)")
  }

  test("mixed-dimension MULTIPOINT pads to the collection flags") {
    val g = GMulti(4, Array(GPoint(1, 2, 3, true, 4, true), GPoint(5, 6)))
    val w = Geom.toWkt(g)
    assert(w === "MULTIPOINT ZM ((1 2 3 4),(5 6 0 0))", w)
    val back = Geom.fromWkt(w) // must reparse cleanly
    assert(back.hasZ && back.hasM)
  }

  test("measures survive st_transform and EWKB M flag is read") {
    val m = Geom.fromWkt("LINESTRING M (3 0 42,4 1 43)")
    val out = graft.expr.GeoRt.transform(Geom.toWkb(m), 4326, 32631)
    val back = Geom.fromWkb(out).asInstanceOf[GLine]
    assert(back.hasM && back.mAt(0) === 42.0 && back.mAt(1) === 43.0)
    // EWKB-style M flag (0x40000000)
    val iso = Geom.toWkb(Geom.fromWkt("POINT M (1 2 7)"))
    val ewkb = iso.clone()
    java.nio.ByteBuffer.wrap(ewkb, 1, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1 | 0x40000000)
    val p = Geom.fromWkb(ewkb).asInstanceOf[GPoint]
    assert(p.isMeasured && p.m === 7.0)
  }
}
