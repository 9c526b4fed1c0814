package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Envelope, Geom}
import graft.index.CellGrid

class CellGridSpec extends AnyFunSuite {

  test("cell id round-trips res/ix/iy") {
    val c = CellGrid.cellId(2.2945, 48.8584, 12)
    assert(CellGrid.res(c) == 12)
    val e = CellGrid.cellEnvelope(c)
    assert(e.contains(2.2945, 48.8584))
  }

  test("parent/children hierarchy is consistent") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val res = 1 + rnd.nextInt(20)
        val c = CellGrid.cellId(lon, lat, res)
        val p = CellGrid.parent(c)
        assert(CellGrid.res(p) == res - 1)
        assert(CellGrid.children(p).contains(c))
        // parent cell contains the point too
        assert(CellGrid.cellEnvelope(p).contains(lon, lat))
    }
  }

  test("cell id is plain arithmetic (SQL-oracle parity formula)") {
    // cellId = res*2^52 + floor((lon+180)/360*2^res)*2^26 + floor((lat+90)/180*2^res)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val lon = rnd.nextDouble() * 359.98 - 179.99
      val lat = rnd.nextDouble() * 179.98 - 89.99
      val res = 12
      val n = 1L << res
      val ix = math.min(n - 1, math.max(0, math.floor((lon + 180.0) / 360.0 * n).toLong))
      val iy = math.min(n - 1, math.max(0, math.floor((lat + 90.0) / 180.0 * n).toLong))
      val expected = res.toLong * (1L << 52) + ix * (1L << 26) + iy
      assert(CellGrid.cellId(lon, lat, res) == expected)
    }
  }

  test("ring k=1 has 8 cells away from edges; disk contains center") {
    val c = CellGrid.cellId(10.0, 20.0, 10)
    val r1 = CellGrid.ring(c, 1)
    assert(r1.length == 8)
    assert(!r1.contains(c))
    val d1 = CellGrid.disk(c, 1)
    assert(d1.length == 9 && d1.contains(c))
    val r2 = CellGrid.ring(c, 2)
    assert(r2.length == 16)
  }

  test("ring clamps at poles and wraps at antimeridian") {
    val top = CellGrid.cellId(0.0, 89.99, 5)
    val rTop = CellGrid.ring(top, 1)
    assert(rTop.length == 5) // 3 below + 2 sides, nothing above
    val left = CellGrid.cellId(-179.99, 0.0, 5)
    val rLeft = CellGrid.ring(left, 1)
    assert(rLeft.length == 8) // wraps around
    assert(rLeft.forall(c => CellGrid.ix(c) < (1L << 5)))
  }

  test("coverEnvelope covers exactly the intersecting cells") {
    val env = Envelope(-1.0, -1.0, 1.0, 1.0)
    val cells = CellGrid.coverEnvelope(env, 8)
    assert(cells.nonEmpty)
    for (c <- cells) assert(CellGrid.cellEnvelope(c).intersects(env))
    // a point inside the envelope maps to a covered cell
    assert(cells.contains(CellGrid.cellId(0.5, 0.5, 8)))
  }

  test("polyfill is tighter than bbox cover for a triangle") {
    val tri = Geom.fromWkt("POLYGON ((0 0,20 0,0 20,0 0))")
    val res = 8
    val bbox = CellGrid.coverEnvelope(tri.envelope, res)
    val fill = CellGrid.polyfill(tri, res)
    assert(fill.length < bbox.length)
    assert(fill.toSet.subsetOf(bbox.toSet))
    // every cell containing an interior point is present
    assert(fill.contains(CellGrid.cellId(5.0, 5.0, res)))
  }
}
