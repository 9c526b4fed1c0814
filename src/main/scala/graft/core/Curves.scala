package graft.core

/** Curved geometries — CIRCULARSTRING / COMPOUNDCURVE / CURVEPOLYGON
  * parsing, linearization and point containment, re-expressing
  * `/root/reference/gdal/ogr/ogrgeometry.cpp:2795` getLinearGeometry
  * (arc stroking at OGR_ARC_STEPSIZE degrees, default 4) and the exact
  * circle Intersects/Contains optimization exercised by
  * `autotest/ogr/ogr_geom.py:2233-2269` (a point 1e-4 inside a circle
  * must test inside even when stroking at 45°).
  */
object Curves {

  sealed trait CurveGeom
  /** 2k+1 points; consecutive triplets define arcs. */
  final case class CircString(xy: Array[Double]) extends CurveGeom
  final case class Compound(parts: Seq[CurveGeom]) extends CurveGeom // CircString | LineSeg
  final case class LineSeg(xy: Array[Double]) extends CurveGeom
  final case class CurvePoly(rings: Seq[CurveGeom]) extends CurveGeom

  // ------------------------------------------------------------ parsing ----

  /** Parse the curve-WKT subset (plain geometries delegate to Geom). */
  def fromWkt(wkt0: String): CurveGeom = {
    val wkt = wkt0.trim
    val upper = wkt.toUpperCase
    def body(s: String): String = {
      val i = s.indexOf('(')
      require(i >= 0, s"no body in $s")
      s.substring(i + 1, s.lastIndexOf(')'))
    }
    def coords(s: String): Array[Double] =
      s.split(",").flatMap(_.trim.split("\\s+").take(2).map(_.toDouble))
    if (upper.startsWith("CIRCULARSTRING")) CircString(coords(body(wkt)))
    else if (upper.startsWith("COMPOUNDCURVE")) {
      // parts split at top-level commas between closing/opening parens
      val b = body(wkt)
      val parts = Seq.newBuilder[CurveGeom]
      var depth = 0; var start = 0
      for (i <- b.indices) {
        b(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            parts += parsePart(b.substring(start, i).trim); start = i + 1
          case _ =>
        }
      }
      parts += parsePart(b.substring(start).trim)
      Compound(parts.result())
    } else if (upper.startsWith("CURVEPOLYGON")) {
      val b = body(wkt)
      val rings = Seq.newBuilder[CurveGeom]
      var depth = 0; var start = 0
      for (i <- b.indices) {
        b(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            rings += parseRing(b.substring(start, i).trim); start = i + 1
          case _ =>
        }
      }
      rings += parseRing(b.substring(start).trim)
      CurvePoly(rings.result())
    } else sys.error(s"unsupported curve WKT: ${wkt.take(30)}")
  }

  private def parsePart(s: String): CurveGeom =
    if (s.toUpperCase.startsWith("CIRCULARSTRING")) fromWkt(s)
    else LineSeg(s.stripPrefix("(").stripSuffix(")").split(",")
      .flatMap(_.trim.split("\\s+").take(2).map(_.toDouble)))

  private def parseRing(s: String): CurveGeom =
    if (s.toUpperCase.startsWith("CIRCULARSTRING") ||
        s.toUpperCase.startsWith("COMPOUNDCURVE")) fromWkt(s)
    else LineSeg(s.stripPrefix("(").stripSuffix(")").split(",")
      .flatMap(_.trim.split("\\s+").take(2).map(_.toDouble)))

  // ------------------------------------------------------ arc geometry ----

  /** (cx, cy, r) of the circle through 3 points; None when collinear.
    * SQL/MM full-circle arcs (p0 == p2) use the circle with diameter
    * p0–p1.
    */
  def circleOf(x0: Double, y0: Double, x1: Double, y1: Double,
               x2: Double, y2: Double): Option[(Double, Double, Double)] = {
    if (x0 == x2 && y0 == y2) {
      val cx = (x0 + x1) / 2; val cy = (y0 + y1) / 2
      val r = math.hypot(x1 - x0, y1 - y0) / 2
      return if (r == 0) None else Some((cx, cy, r))
    }
    val d = 2 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    if (math.abs(d) < 1e-12) None
    else {
      val ux = ((x0 * x0 + y0 * y0) * (y1 - y2) + (x1 * x1 + y1 * y1) * (y2 - y0) +
        (x2 * x2 + y2 * y2) * (y0 - y1)) / d
      val uy = ((x0 * x0 + y0 * y0) * (x2 - x1) + (x1 * x1 + y1 * y1) * (x0 - x2) +
        (x2 * x2 + y2 * y2) * (x1 - x0)) / d
      Some((ux, uy, math.hypot(x0 - ux, y0 - uy)))
    }
  }

  @inline private def mod2pi(a: Double): Double = {
    var x = a % (2 * math.Pi)
    if (x < 0) x += 2 * math.Pi
    x
  }

  /** Signed sweep of the arc (p0→p1→p2); positive = CCW. Full-circle arcs
    * (p0 == p2) sweep ±2π through p1.
    */
  def arcSweep(cx: Double, cy: Double, x0: Double, y0: Double,
               x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val a0 = math.atan2(y0 - cy, x0 - cx)
    val a1 = math.atan2(y1 - cy, x1 - cx)
    val a2 = math.atan2(y2 - cy, x2 - cx)
    val d01 = mod2pi(a1 - a0)
    val d02 = mod2pi(a2 - a0)
    if (x0 == x2 && y0 == y2) { if (d01 <= math.Pi) 2 * math.Pi else -2 * math.Pi }
    else if (d01 <= d02) d02
    else d02 - 2 * math.Pi
  }

  /** Stroke one arc into points INCLUDING both endpoints exactly and the
    * middle point exactly (two half-arc strokes, like the reference).
    */
  private def strokeArc(x0: Double, y0: Double, x1: Double, y1: Double,
                        x2: Double, y2: Double, stepDeg: Double): Seq[(Double, Double)] =
    circleOf(x0, y0, x1, y1, x2, y2) match {
      case None => Seq((x0, y0), (x1, y1), (x2, y2))
      case Some((cx, cy, r)) =>
        val sweep = arcSweep(cx, cy, x0, y0, x1, y1, x2, y2)
        def half(ax: Double, ay: Double, bx: Double, by: Double, sw: Double): Seq[(Double, Double)] = {
          val aa = math.atan2(ay - cy, ax - cx)
          val n = math.max(2, math.ceil(math.abs(math.toDegrees(sw)) / stepDeg).toInt + 1)
          val slice = sw / (n - 1)
          (0 until n).map { i =>
            if (i == 0) (ax, ay)
            else if (i == n - 1) (bx, by)
            else {
              val a = aa + i * slice
              (cx + r * math.cos(a), cy + r * math.sin(a))
            }
          }
        }
        // split at p1 so the middle point is exact
        val a0 = math.atan2(y0 - cy, x0 - cx)
        val a1 = math.atan2(y1 - cy, x1 - cx)
        val sw1 = if (sweep >= 0) mod2pi(a1 - a0) else mod2pi(a1 - a0) - 2 * math.Pi
        val sw2 = sweep - sw1
        half(x0, y0, x1, y1, sw1) ++ half(x1, y1, x2, y2, sw2).drop(1)
    }

  private def strokeCurve(c: CurveGeom, stepDeg: Double): Seq[(Double, Double)] = c match {
    case CircString(xy) =>
      val n = xy.length / 2
      var out = Seq.empty[(Double, Double)]
      var i = 0
      while (i + 2 < n) {
        val seg = strokeArc(xy(2 * i), xy(2 * i + 1), xy(2 * i + 2), xy(2 * i + 3),
          xy(2 * i + 4), xy(2 * i + 5), stepDeg)
        out = if (out.isEmpty) seg else out ++ seg.drop(1)
        i += 2
      }
      out
    case LineSeg(xy) => (0 until xy.length / 2).map(i => (xy(2 * i), xy(2 * i + 1)))
    case Compound(parts) =>
      parts.foldLeft(Seq.empty[(Double, Double)]) { (acc, p) =>
        val seg = strokeCurve(p, stepDeg)
        if (acc.isEmpty) seg else acc ++ seg.drop(1)
      }
    case CurvePoly(_) => sys.error("stroke ring-by-ring for polygons")
  }

  /** getLinearGeometry: curve → GLine / GPolygon at `stepDeg` stroking. */
  def linearize(c: CurveGeom, stepDeg: Double = 4.0): Geom = c match {
    case CurvePoly(rings) =>
      GPolygon(rings.map { ring =>
        val pts = strokeCurve(ring, stepDeg)
        val closed = if (pts.head == pts.last) pts else pts :+ pts.head
        GLine(closed.flatMap(p => Seq(p._1, p._2)).toArray)
      }.toArray)
    case other =>
      val pts = strokeCurve(other, stepDeg)
      GLine(pts.flatMap(p => Seq(p._1, p._2)).toArray)
  }

  /** Detect a CurvePolygon whose exterior ring is one closed CircString
    * tracing a single full circle (all triplets on one circle, |total
    * sweep| = 2π) → (cx, cy, r).
    */
  def asFullCircle(c: CurveGeom): Option[(Double, Double, Double)] = c match {
    case CurvePoly(Seq(CircString(xy))) =>
      val n = xy.length / 2
      if (n < 3 || xy(0) != xy(2 * n - 2) || xy(1) != xy(2 * n - 1)) return None
      var circle: Option[(Double, Double, Double)] = None
      var total = 0.0
      var i = 0
      while (i + 2 < n) {
        circleOf(xy(2 * i), xy(2 * i + 1), xy(2 * i + 2), xy(2 * i + 3),
            xy(2 * i + 4), xy(2 * i + 5)) match {
          case None => return None
          case Some((cx, cy, r)) =>
            circle match {
              case Some((pcx, pcy, pr)) =>
                if (math.abs(cx - pcx) > 1e-9 * (1 + pr) ||
                    math.abs(cy - pcy) > 1e-9 * (1 + pr) ||
                    math.abs(r - pr) > 1e-9 * (1 + pr)) return None
              case None => circle = Some((cx, cy, r))
            }
            total += arcSweep(cx, cy, xy(2 * i), xy(2 * i + 1),
              xy(2 * i + 2), xy(2 * i + 3), xy(2 * i + 4), xy(2 * i + 5))
        }
        i += 2
      }
      circle.filter(_ => math.abs(math.abs(total) - 2 * math.Pi) < 1e-9)
    case _ => None
  }

  /** Point containment: exact for single-circle CurvePolygons (no
    * discretization, matching the reference optimization); stroked ray
    * cast otherwise.
    */
  def containsPoint(c: CurveGeom, x: Double, y: Double, stepDeg: Double = 4.0): Boolean =
    asFullCircle(c) match {
      case Some((cx, cy, r)) => math.hypot(x - cx, y - cy) <= r
      case None => c match {
        case p: CurvePoly => GeomOps.containsPoint(linearize(p, stepDeg), x, y)
        case _ => false
      }
    }
}
