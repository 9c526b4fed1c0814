package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geom, GLine, GPoint, GPolygon}
import graft.index.CellGrid
import graft.raster.Checksum

/** Property-style invariants over seeded deterministic samples (the
  * pre-warmed cache lacks scalatestplus-scalacheck, so sampling is
  * hand-rolled: 200 cases per property, splitmix-derived).
  */
class PropertySpec extends AnyFunSuite {

  private def samples(seed: Long, n: Int = 200): Seq[Long] =
    (0 until n).map(i => graft.sources.Pages.mix(seed + i))
  private def unit(h: Long): Double = ((h >>> 11) & 0xfffffffffffffL).toDouble / (1L << 52)
  private def coordOf(h: Long): Double = math.rint((unit(h) * 2e6 - 1e6) * 100) / 100
  private def forAll[A](seed: Long)(f: Long => Unit): Unit =
    samples(seed).foreach(f)

  test("WKB round-trips points and lines exactly") {
    forAll(1L) { h =>
      val p = GPoint(coordOf(h), coordOf(h * 31))
      assert(Geom.fromWkb(Geom.toWkb(p)) === p)
      val n = 2 + (h & 0xf).toInt
      val xy = Array.tabulate(2 * n)(i => coordOf(h + 7 * i))
      val back = Geom.fromWkb(Geom.toWkb(GLine(xy))).asInstanceOf[GLine]
      assert(back.xy.toSeq === xy.toSeq)
    }
  }

  test("WKT round-trips hexagon polygons through text") {
    forAll(2L) { h =>
      val cx = coordOf(h); val cy = coordOf(h * 13)
      val r = 1.0 + unit(h * 17) * 99.0
      val pts = (0 until 6).map { i =>
        val a = i * math.Pi / 3
        (math.rint((cx + r * math.cos(a)) * 100) / 100,
         math.rint((cy + r * math.sin(a)) * 100) / 100)
      } :+ ((math.rint((cx + r) * 100) / 100, cy))
      val poly = GPolygon(Array(GLine(pts.flatMap(p => Seq(p._1, p._2)).toArray)))
      val back = Geom.fromWkt(Geom.toWkt(poly)).asInstanceOf[GPolygon]
      assert(back.rings(0).xy.toSeq === poly.rings(0).xy.toSeq)
    }
  }

  test("cell hierarchy: parent contains child center; cellId is stable") {
    forAll(3L) { h =>
      val lon = unit(h) * 359.98 - 179.99
      val lat = unit(h * 7) * 179.98 - 89.99
      val res = 1 + (h & 0xf).toInt % 20
      val cell = CellGrid.cellId(lon, lat, res)
      assert(CellGrid.res(cell) === res)
      val parent = CellGrid.parent(cell)
      val (cx, cy) = CellGrid.cellCenter(cell)
      assert(CellGrid.cellEnvelope(parent).contains(cx, cy))
      assert(CellGrid.children(parent).contains(cell))
      // the point is inside its own cell envelope
      assert(CellGrid.cellEnvelope(cell).contains(lon, lat))
    }
  }

  test("ring/disk: ring k has the expected size away from poles") {
    forAll(4L) { h =>
      val lon = unit(h) * 340.0 - 170.0
      val lat = unit(h * 7) * 120.0 - 60.0
      val k = 1 + (h & 0x3).toInt % 3
      val cell = CellGrid.cellId(lon, lat, 10)
      val ring = CellGrid.ring(cell, k)
      assert(ring.length === 8 * k)
      assert(CellGrid.disk(cell, k).length === (2 * k + 1) * (2 * k + 1))
    }
  }

  test("checksum partials compose to the whole for any strip split") {
    forAll(5L) { h0 =>
      val w = 1 + (h0 & 0x1f).toInt
      val hh = 1 + ((h0 >>> 8) & 0x1f).toInt
      val vals = Array.tabulate(w * hh)(i => (graft.sources.Pages.mix(h0 + i) & 0x1ff).toInt - 64)
      val whole = Checksum.finish(Checksum.partialInt(vals, 0, vals.length, 0L))
      for (stripH <- 1 to hh) {
        var sum = 0L
        var y = 0
        while (y < hh) {
          val rows = math.min(stripH, hh - y)
          sum += Checksum.partialInt(vals, y * w, rows * w, y.toLong * w)
          y += rows
        }
        assert(Checksum.finish(sum) === whole)
      }
    }
  }

  test("PIP: centroid of a convex polygon is inside; far points are not") {
    forAll(6L) { h =>
      val cx = coordOf(h); val cy = coordOf(h * 3)
      val r = 1.0 + unit(h * 11) * 999.0
      val pts = (0 until 8).map { i =>
        val a = i * math.Pi / 4
        (cx + r * math.cos(a), cy + r * math.sin(a))
      }
      val xy = (pts :+ pts.head).flatMap(p => Seq(p._1, p._2)).toArray
      val poly = GPolygon(Array(GLine(xy)))
      assert(graft.core.GeomOps.polygonContainsPoint(poly, cx, cy))
      assert(!graft.core.GeomOps.polygonContainsPoint(poly, cx + 3 * r, cy))
    }
  }
}
