package graft.core

/** Bowyer–Watson Delaunay triangulation — the triangulation behind the
  * reference's linear gridding (`/root/reference/gdal/alg/gdalgrid.cpp`
  * GDALGridLinear, which delegates to a global triangulation of the input
  * points; the reference holds all points in memory for this too).
  * Barycentric interpolation over the triangles reproduces any planar
  * field exactly — the property the driver oracle checks.
  */
object Delaunay {

  final case class Tri(a: Int, b: Int, c: Int)

  /** Triangulate (xs, ys); returns triangles over input indices. */
  def triangulate(xs: Array[Double], ys: Array[Double]): Array[Tri] = {
    val n = xs.length
    require(n >= 3, "need at least 3 points")
    // super-triangle enclosing everything
    var minX = xs(0); var maxX = xs(0); var minY = ys(0); var maxY = ys(0)
    for (i <- 1 until n) {
      if (xs(i) < minX) minX = xs(i); if (xs(i) > maxX) maxX = xs(i)
      if (ys(i) < minY) minY = ys(i); if (ys(i) > maxY) maxY = ys(i)
    }
    val dx = maxX - minX; val dy = maxY - minY
    val dmax = math.max(dx, dy) max 1.0
    val midX = (minX + maxX) / 2; val midY = (minY + maxY) / 2
    val px = new Array[Double](n + 3)
    val py = new Array[Double](n + 3)
    System.arraycopy(xs, 0, px, 0, n)
    System.arraycopy(ys, 0, py, 0, n)
    px(n) = midX - 20 * dmax; py(n) = midY - dmax
    px(n + 1) = midX; py(n + 1) = midY + 20 * dmax
    px(n + 2) = midX + 20 * dmax; py(n + 2) = midY - dmax

    var tris = List(Tri(n, n + 1, n + 2))

    @inline def inCircumcircle(t: Tri, x: Double, y: Double): Boolean = {
      val ax = px(t.a) - x; val ay = py(t.a) - y
      val bx = px(t.b) - x; val by = py(t.b) - y
      val cx = px(t.c) - x; val cy = py(t.c) - y
      val det =
        (ax * ax + ay * ay) * (bx * cy - cx * by) -
        (bx * bx + by * by) * (ax * cy - cx * ay) +
        (cx * cx + cy * cy) * (ax * by - bx * ay)
      // sign depends on orientation; normalize by triangle orientation
      val orient = (px(t.b) - px(t.a)) * (py(t.c) - py(t.a)) -
        (px(t.c) - px(t.a)) * (py(t.b) - py(t.a))
      if (orient > 0) det > 0 else det < 0
    }

    for (i <- 0 until n) {
      val bad = tris.filter(t => inCircumcircle(t, px(i), py(i)))
      val good = tris.filterNot(t => inCircumcircle(t, px(i), py(i)))
      // boundary of the cavity: edges appearing exactly once among bad tris
      val edges = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      def addEdge(u: Int, v: Int): Unit = {
        val k = if (u < v) (u, v) else (v, u)
        edges(k) = edges.getOrElse(k, 0) + 1
      }
      bad.foreach { t => addEdge(t.a, t.b); addEdge(t.b, t.c); addEdge(t.c, t.a) }
      // NOTE: must leave Map-land before collecting to pairs — a Map's
      // collect would re-key by the first vertex and silently drop edges
      val boundary = edges.iterator.collect { case (e, 1) => e }.toSeq
      tris = good ++ boundary.map { case (u, v) => Tri(u, v, i) }
    }
    tris.filter(t => t.a < n && t.b < n && t.c < n).toArray
  }

  /** Barycentric linear interpolation at (x, y); None when outside every
    * triangle (the reference's nodata case).
    */
  def interpolate(xs: Array[Double], ys: Array[Double], zs: Array[Double],
                  tris: Array[Tri], x: Double, y: Double): Option[Double] =
    interpolateTri(xs, ys, zs, tris, x, y).map(_._2)

  /** Like [[interpolate]] but also returns WHICH triangle contained the
    * query — the distributed gridder needs it for the circumcircle
    * containment proof.
    */
  def interpolateTri(xs: Array[Double], ys: Array[Double], zs: Array[Double],
                     tris: Array[Tri], x: Double, y: Double): Option[(Int, Double)] = {
    var i = 0
    while (i < tris.length) {
      val t = tris(i)
      val x1 = xs(t.a); val y1 = ys(t.a)
      val x2 = xs(t.b); val y2 = ys(t.b)
      val x3 = xs(t.c); val y3 = ys(t.c)
      val det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
      if (det != 0.0) {
        val l1 = ((y2 - y3) * (x - x3) + (x3 - x2) * (y - y3)) / det
        val l2 = ((y3 - y1) * (x - x3) + (x1 - x3) * (y - y3)) / det
        val l3 = 1.0 - l1 - l2
        val eps = -1e-10
        if (l1 >= eps && l2 >= eps && l3 >= eps)
          return Some((i, l1 * zs(t.a) + l2 * zs(t.b) + l3 * zs(t.c)))
      }
      i += 1
    }
    None
  }

  /** Circumcircle (center, radius) of triangle `t`, computed in
    * coordinates centered at the first vertex (conditioning on triangle
    * extent, not coordinate magnitude). Infinite radius for degenerate
    * triangles.
    */
  def circumcircle(xs: Array[Double], ys: Array[Double], t: Tri)
      : (Double, Double, Double) = {
    val ax = xs(t.a); val ay = ys(t.a)
    val bx = xs(t.b) - ax; val by = ys(t.b) - ay
    val cx = xs(t.c) - ax; val cy = ys(t.c) - ay
    val d = 2.0 * (bx * cy - by * cx)
    if (d == 0.0) return (ax, ay, Double.PositiveInfinity)
    val b2 = bx * bx + by * by
    val c2 = cx * cx + cy * cy
    val ux = (cy * b2 - by * c2) / d
    val uy = (bx * c2 - cx * b2) / d
    (ax + ux, ay + uy, math.hypot(ux, uy))
  }
}
