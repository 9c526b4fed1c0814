package graft.core

/** Constructive polygon geometry — boolean overlay of simple polygons
  * (Greiner–Hormann vertex-list clipping), giving the geometry algebra
  * behind the reference's Intersection/Union/Difference/SymDifference
  * (`/root/reference/gdal/ogr/ogrgeometry.cpp:3229,:3335,:3436,:3619`,
  * which delegate to GEOS) and the layer-algebra ops Intersection/Clip/
  * Erase (`gdal/ogr/ogrlayer.cpp:2034,:3878,:4151`) that emit CLIPPED
  * geometries, not just intersecting pairs.
  *
  * Scope: simple polygons (one exterior ring each). Proper edge crossings
  * are handled exactly; degenerate configurations (shared edges, vertex-
  * on-edge) are resolved by retrying with a deterministic microscopic
  * clip-polygon perturbation (documented; the reference's GEOS uses snap
  * rounding for the same purpose). Holes appear in output where the
  * result requires them (B strictly inside A for A−B).
  */
object GeomClip {

  private final val Eps = 1e-12

  private final class Vtx(val x: Double, val y: Double) {
    var next: Vtx = _
    var prev: Vtx = _
    var neighbor: Vtx = _
    var intersect = false
    var entry = false
    var visited = false
    var alpha = 0.0
  }

  private final class DegenerateOverlay extends RuntimeException

  /** Build a circular doubly-linked list from an open ring. */
  private def buildList(pts: Array[Double]): Vtx = {
    val n = pts.length / 2
    val vs = Array.tabulate(n)(i => new Vtx(pts(2 * i), pts(2 * i + 1)))
    for (i <- 0 until n) {
      vs(i).next = vs((i + 1) % n)
      vs(i).prev = vs((i + n - 1) % n)
    }
    vs(0)
  }

  private def vertices(start: Vtx): Iterator[Vtx] = new Iterator[Vtx] {
    private var cur = start
    private var done = false
    override def hasNext: Boolean = !done
    override def next(): Vtx = {
      val v = cur
      cur = cur.next
      if (cur eq start) done = true
      v
    }
  }

  /** Insert an intersection vertex after `from`, ordered by alpha among
    * other intersection vertices on the same source edge.
    */
  private def insertSorted(from: Vtx, v: Vtx): Unit = {
    var cur = from
    while (cur.next.intersect && cur.next.alpha < v.alpha) cur = cur.next
    v.next = cur.next
    v.prev = cur
    cur.next.prev = v
    cur.next = v
  }

  /** Phase 1: compute & insert all proper intersections; degenerate hits
    * (endpoint α/β ≈ 0 or 1, collinear overlap crossing zero) throw.
    * Returns number of intersections.
    */
  private def insertIntersections(a0: Vtx, b0: Vtx): Int = {
    var count = 0
    val aEdges = vertices(a0).filter(!_.intersect).toArray
    val bEdges = vertices(b0).filter(!_.intersect).toArray
    for (va <- aEdges; vb <- bEdges) {
      // original edge endpoints: skip inserted intersection vertices
      var aEnd = va.next; while (aEnd.intersect) aEnd = aEnd.next
      var bEnd = vb.next; while (bEnd.intersect) bEnd = bEnd.next
      val x1 = va.x; val y1 = va.y; val x2 = aEnd.x; val y2 = aEnd.y
      val x3 = vb.x; val y3 = vb.y; val x4 = bEnd.x; val y4 = bEnd.y
      val denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
      if (denom != 0.0) {
        val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
        val u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / denom
        if (t > -Eps && t < 1 + Eps && u > -Eps && u < 1 + Eps) {
          if (t < Eps || t > 1 - Eps || u < Eps || u > 1 - Eps)
            throw new DegenerateOverlay // endpoint touch: retry perturbed
          val ix = x1 + t * (x2 - x1)
          val iy = y1 + t * (y2 - y1)
          val ia = new Vtx(ix, iy); ia.intersect = true; ia.alpha = t
          val ib = new Vtx(ix, iy); ib.intersect = true; ib.alpha = u
          ia.neighbor = ib; ib.neighbor = ia
          insertSorted(va, ia)
          insertSorted(vb, ib)
          count += 1
        }
      } else {
        // parallel: collinear overlap is degenerate
        val cross = (x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)
        if (cross == 0.0) {
          // same supporting line: degenerate only if segments overlap
          val (loA, hiA) = if (math.abs(x2 - x1) >= math.abs(y2 - y1))
            (math.min(x1, x2), math.max(x1, x2)) else (math.min(y1, y2), math.max(y1, y2))
          val (loB, hiB) = if (math.abs(x2 - x1) >= math.abs(y2 - y1))
            (math.min(x3, x4), math.max(x3, x4)) else (math.min(y3, y4), math.max(y3, y4))
          if (math.max(loA, loB) < math.min(hiA, hiB) - Eps) throw new DegenerateOverlay
        }
      }
    }
    count
  }

  private def pip(pts: Array[Double], x: Double, y: Double): Boolean =
    GeomOps.containsPoint(GPolygon(Array(GLine(pts ++ Array(pts(0), pts(1))))), x, y)

  /** Phase 2: alternate entry/exit flags starting from the first vertex's
    * inside status; `invert` flips the convention (union/difference).
    */
  private def markEntries(start: Vtx, otherPts: Array[Double], invert: Boolean): Unit = {
    var entry = !pip(otherPts, start.x, start.y)
    if (invert) entry = !entry
    vertices(start).foreach { v =>
      if (v.intersect) { v.entry = entry; entry = !entry }
    }
  }

  /** Phase 3: traverse, yielding closed result rings (open point arrays). */
  private def traverse(a0: Vtx): Seq[Array[Double]] = {
    val out = Seq.newBuilder[Array[Double]]
    var remaining = vertices(a0).filter(v => v.intersect && !v.visited).toList
    while (remaining.nonEmpty) {
      val startI = remaining.head
      val pts = new scala.collection.mutable.ArrayBuffer[Double]()
      var cur = startI
      var closed = false
      pts += cur.x; pts += cur.y
      cur.visited = true; cur.neighbor.visited = true
      var guard = 0
      while (!closed && guard < 1000000) {
        guard += 1
        if (cur.entry) {
          var going = true
          while (going) {
            cur = cur.next
            if (cur.intersect) going = false
            else { pts += cur.x; pts += cur.y }
          }
        } else {
          var going = true
          while (going) {
            cur = cur.prev
            if (cur.intersect) going = false
            else { pts += cur.x; pts += cur.y }
          }
        }
        cur.visited = true; cur.neighbor.visited = true
        cur = cur.neighbor
        if ((cur eq startI) || (cur.neighbor eq startI)) closed = true
        else { pts += cur.x; pts += cur.y }
      }
      if (pts.length >= 6) out += pts.toArray
      remaining = remaining.filter(v => !v.visited)
    }
    out.result()
  }

  private def closeRing(open: Array[Double]): GLine =
    GLine(open ++ Array(open(0), open(1)))

  private def openRing(p: GPolygon): Array[Double] = {
    val xy = p.rings(0).xy
    val n = xy.length / 2
    if (n >= 2 && xy(0) == xy(2 * n - 2) && xy(1) == xy(2 * n - 1))
      java.util.Arrays.copyOfRange(xy, 0, 2 * n - 2)
    else xy
  }

  sealed trait Op
  case object OpIntersection extends Op
  case object OpUnion extends Op
  case object OpDifference extends Op

  /** One boolean overlay; throws DegenerateOverlay internally → retried
    * by [[overlay]] with a perturbed clip ring.
    */
  private def overlayOnce(aPts: Array[Double], bPts: Array[Double], op: Op): Seq[Geom] = {
    val a0 = buildList(aPts)
    val b0 = buildList(bPts)
    val n = insertIntersections(a0, b0)
    if (n == 0) {
      val aInB = pip(bPts, aPts(0), aPts(1))
      val bInA = pip(aPts, bPts(0), bPts(1))
      return op match {
        case OpIntersection =>
          if (aInB) Seq(GPolygon(Array(closeRing(aPts))))
          else if (bInA) Seq(GPolygon(Array(closeRing(bPts))))
          else Seq.empty
        case OpUnion =>
          if (aInB) Seq(GPolygon(Array(closeRing(bPts))))
          else if (bInA) Seq(GPolygon(Array(closeRing(aPts))))
          else Seq(GPolygon(Array(closeRing(aPts))), GPolygon(Array(closeRing(bPts))))
        case OpDifference =>
          if (aInB) Seq.empty
          else if (bInA) Seq(GPolygon(Array(closeRing(aPts), closeRing(bPts)))) // hole
          else Seq(GPolygon(Array(closeRing(aPts))))
      }
    }
    op match {
      case OpIntersection =>
        markEntries(a0, bPts, invert = false)
        markEntries(b0, aPts, invert = false)
      case OpUnion =>
        markEntries(a0, bPts, invert = true)
        markEntries(b0, aPts, invert = true)
      case OpDifference =>
        markEntries(a0, bPts, invert = true)
        markEntries(b0, aPts, invert = false)
    }
    traverse(a0).map(r => GPolygon(Array(closeRing(r))))
  }

  /** Deterministic microscopic perturbation of the clip ring, scaled to
    * the geometry size — used only when the exact overlay is degenerate.
    */
  private def perturb(pts: Array[Double], attempt: Int): Array[Double] = {
    val env = closeRing(pts).envelope
    val scale = math.max(env.maxX - env.minX, env.maxY - env.minY) max 1.0
    val d = scale * 1e-9 * attempt
    pts.zipWithIndex.map { case (v, i) => if (i % 2 == 0) v + d else v + d * 0.618 }
  }

  private def run(a: GPolygon, b: GPolygon, op: Op): Seq[Geom] = {
    val aPts = openRing(a)
    val bPts0 = openRing(b)
    var attempt = 0
    var result: Seq[Geom] = null
    while (result == null && attempt < 4) {
      val bPts = if (attempt == 0) bPts0 else perturb(bPts0, attempt)
      try result = overlayOnce(aPts, bPts, op)
      catch { case _: DegenerateOverlay => attempt += 1 }
    }
    if (result == null)
      throw new IllegalArgumentException("degenerate overlay not resolvable by perturbation")
    result
  }

  private def wrap(gs: Seq[Geom]): Option[Geom] = gs match {
    case Seq() => None
    case Seq(one) => Some(one)
    case many => Some(GMulti(6, many.toArray))
  }

  def intersection(a: GPolygon, b: GPolygon): Option[Geom] = wrap(run(a, b, OpIntersection))
  def union(a: GPolygon, b: GPolygon): Option[Geom] = wrap(run(a, b, OpUnion))
  def difference(a: GPolygon, b: GPolygon): Option[Geom] = wrap(run(a, b, OpDifference))

  /** A△B = (A−B) ∪ (B−A), emitted as a multipolygon of the pieces. */
  def symDifference(a: GPolygon, b: GPolygon): Option[Geom] = {
    val pieces = run(a, b, OpDifference) ++ run(b, a, OpDifference)
    wrap(pieces)
  }

  /** Buffer (`ogrgeometry.cpp:3229`, GEOS-delegated in the reference).
    * Points buffer to a 4·quadSegs-gon circle (GEOS quadrant-segment
    * convention, default 8 → 32 vertices, first vertex at angle 0 — the
    * layout behind the autotest expectation
    * `POINT(1 2).Buffer(0.5) ≈ circle (1.5 2)…(0.5 2)`). Lines and
    * polygons (convex OR concave, holes honored, negative distances
    * eroding) buffer EXACTLY through the snap-rounded arrangement:
    * union of the region with one capsule per boundary edge, offset
    * self-intersections resolved by winding extraction
    * ([[Arrangement.buffer]] — the same construction GEOS's offset-curve
    * + noding pipeline performs).
    */
  def buffer(g: Geom, dist: Double, quadSegs: Int = 8): Geom = {
    val n = 4 * quadSegs
    def circle(cx: Double, cy: Double): GPolygon = {
      val xy = new Array[Double]((n + 1) * 2)
      var i = 0
      while (i <= n) {
        val a = 2 * math.Pi * i / n
        xy(2 * i) = cx + dist * math.cos(a)
        xy(2 * i + 1) = cy + dist * math.sin(a)
        i += 1
      }
      xy(2 * n) = xy(0); xy(2 * n + 1) = xy(1)
      GPolygon(Array(GLine(xy)))
    }
    g match {
      case p: GPoint if dist > 0 => circle(p.x, p.y)
      case other =>
        Arrangement.buffer(other, dist, quadSegs) match {
          case Seq() => GMulti(6, Array.empty[Geom])
          case Seq(one) => one
          case many => GMulti(6, many.toArray[Geom])
        }
    }
  }

  /** Boundary (`ogrgeometry.cpp:3097`, OGC semantics): polygon → its
    * ring(s); open curve → endpoints; closed curve / point → empty (None).
    */
  def boundary(g: Geom): Option[Geom] = g match {
    case p: GPolygon =>
      if (p.rings.length == 1) Some(p.rings(0))
      else Some(GMulti(5, p.rings.map(r => r: Geom)))
    case l: GLine =>
      if (l.isClosed || l.numPoints == 0) None
      else Some(GMulti(4, Array[Geom](
        GPoint(l.x(0), l.y(0)), GPoint(l.x(l.numPoints - 1), l.y(l.numPoints - 1)))))
    case GMulti(6, gs) =>
      val rings = gs.flatMap { case p: GPolygon => p.rings.map(r => r: Geom); case _ => Array.empty[Geom] }
      if (rings.isEmpty) None else Some(GMulti(5, rings))
    case _ => None
  }

  /** DelaunayTriangulation (`ogrgeometry.cpp:4651`, GEOS-delegated in the
    * reference): triangulation of the geometry's vertices as a
    * multipolygon of triangles.
    */
  def delaunayTriangulation(g: Geom): Option[Geom] = {
    val pts = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    def collect(gg: Geom): Unit = gg match {
      case p: GPoint => pts += ((p.x, p.y))
      case l: GLine => (0 until l.numPoints).foreach(i => pts += ((l.x(i), l.y(i))))
      case p: GPolygon => p.rings.foreach(collect)
      case GMulti(_, gs) => gs.foreach(collect)
    }
    collect(g)
    val distinct = pts.distinct
    if (distinct.length < 3) return None
    val xs = distinct.map(_._1).toArray
    val ys = distinct.map(_._2).toArray
    val tris = Delaunay.triangulate(xs, ys)
    if (tris.isEmpty) None
    else Some(GMulti(6, tris.map { t =>
      GPolygon(Array(GLine(Array(
        xs(t.a), ys(t.a), xs(t.b), ys(t.b), xs(t.c), ys(t.c), xs(t.a), ys(t.a))))): Geom
    }))
  }

  /** PointOnSurface (`ogrgeometry.cpp:4923`): a point guaranteed interior
    * to the polygon — midpoint of the widest interior span on the scanline
    * through the bounding-box middle (nudged between distinct ring-y
    * values when the middle is degenerate). Points/lines return a vertex.
    */
  def pointOnSurface(g: Geom): Option[GPoint] = g match {
    case p: GPoint => Some(p)
    case l: GLine if l.numPoints > 0 =>
      Some(GPoint(l.x(l.numPoints / 2), l.y(l.numPoints / 2)))
    case poly: GPolygon =>
      val env = poly.envelope
      // candidate scan ys: midline first, then offsets between ring ys
      val candidates = ((env.minY + env.maxY) / 2) +:
        (1 to 7).map(k => env.minY + (env.maxY - env.minY) * k / 8.0)
      candidates.iterator.flatMap { sy =>
        // ring crossings at y = sy (ray-cast span extraction)
        val xsB = Seq.newBuilder[Double]
        poly.rings.foreach { r =>
          var i = 1
          while (i < r.numPoints) {
            val y1 = r.y(i - 1); val y2 = r.y(i)
            if ((y1 <= sy && y2 > sy) || (y2 <= sy && y1 > sy)) {
              val t = (sy - y1) / (y2 - y1)
              xsB += r.x(i - 1) + t * (r.x(i) - r.x(i - 1))
            }
            i += 1
          }
        }
        val xs = xsB.result().sorted
        // interior spans are between even-odd crossing pairs
        xs.grouped(2).collect { case Seq(a, b) if b > a => (b - a, (a + b) / 2, sy) }
      }.toSeq.sortBy(-_._1).headOption.map { case (_, mx, my) => GPoint(mx, my) }
    case GMulti(_, gs) => gs.iterator.flatMap(pointOnSurface).toSeq.headOption
    case _ => None
  }

}
