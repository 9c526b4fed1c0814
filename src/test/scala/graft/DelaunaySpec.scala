package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Delaunay

class DelaunaySpec extends AnyFunSuite {
  test("triangulation of jittered grid covers interior queries; planar exact") {
    val pts = (0 until 100).map { i =>
      val x = (i % 10) * 1.0 + ((i * 7919) % 17) / 100.0
      val y = (i / 10) * 1.0 + ((i * 104729) % 13) / 100.0
      (x, y, 2.5 * x - 1.25 * y + 3.0)
    }
    val xs = pts.map(_._1).toArray; val ys = pts.map(_._2).toArray; val zs = pts.map(_._3).toArray
    val tris = Delaunay.triangulate(xs, ys)
    info(s"triangles: ${tris.length}")
    assert(tris.length > 150, s"expected ~2n triangles, got ${tris.length}")
    val queries = Seq((2.6, 3.1), (5.3, 7.7), (8.1, 1.9), (4.4, 4.6), (1.7, 8.2))
    for ((qx, qy) <- queries) {
      val r = Delaunay.interpolate(xs, ys, zs, tris, qx, qy)
      assert(r.isDefined, s"($qx,$qy) outside triangulation")
      assert(math.abs(r.get - (2.5 * qx - 1.25 * qy + 3.0)) < 1e-9, s"($qx,$qy): ${r.get}")
    }
    // total triangulated area equals the convex hull area (no gaps)
    val triArea = tris.map { t =>
      math.abs((xs(t.b) - xs(t.a)) * (ys(t.c) - ys(t.a)) -
        (xs(t.c) - xs(t.a)) * (ys(t.b) - ys(t.a))) / 2
    }.sum
    info(s"total area: $triArea")
    assert(triArea > 70, s"triangulated area $triArea too small (gaps)")
  }
}
