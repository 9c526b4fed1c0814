package graft.core

/** GeoJSON (RFC 7946) geometry reader/writer — the engine's slice of the
  * reference's GeoJSON driver (`gdal/ogr/ogrsf_frmts/geojson/`) and
  * `OGRGeometryFactory::createFromGeoJson`. Covers Point / LineString /
  * Polygon / MultiPoint / MultiLineString / MultiPolygon /
  * GeometryCollection, with optional Z. Writer emits compact JSON
  * (no whitespace) with shortest-roundtrip number formatting, integers
  * rendered as `N.0` (matching the reference writer's "always a double"
  * convention).
  */
object GeoJson {

  // ------------------------------------------------------------- writer

  private def num(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) {
      if (v == 0.0) "0.0" else s"${v.toLong}.0"
    } else v.toString

  private def posn(x: Double, y: Double, z: Double, hasZ: Boolean): String =
    if (hasZ) s"[${num(x)},${num(y)},${num(z)}]" else s"[${num(x)},${num(y)}]"

  private def lineCoords(l: GLine): String = {
    val sb = new StringBuilder("[")
    var i = 0
    while (i < l.numPoints) {
      if (i > 0) sb += ','
      sb ++= posn(l.x(i), l.y(i), if (l.z != null) l.z(i) else 0.0, l.z != null)
      i += 1
    }
    sb += ']'
    sb.toString
  }

  private def polyCoords(p: GPolygon): String =
    p.rings.map(lineCoords).mkString("[", ",", "]")

  def toJson(g: Geom): String = g match {
    case pt: GPoint =>
      s"""{"type":"Point","coordinates":${posn(pt.x, pt.y, pt.z, pt.is3D)}}"""
    case l: GLine =>
      s"""{"type":"LineString","coordinates":${lineCoords(l)}}"""
    case p: GPolygon =>
      s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
    case GMulti(4, gs) =>
      val cs = gs.collect { case pt: GPoint => posn(pt.x, pt.y, pt.z, pt.is3D) }
      s"""{"type":"MultiPoint","coordinates":${cs.mkString("[", ",", "]")}}"""
    case GMulti(5, gs) =>
      val cs = gs.collect { case l: GLine => lineCoords(l) }
      s"""{"type":"MultiLineString","coordinates":${cs.mkString("[", ",", "]")}}"""
    case GMulti(6, gs) =>
      val cs = gs.collect { case p: GPolygon => polyCoords(p) }
      s"""{"type":"MultiPolygon","coordinates":${cs.mkString("[", ",", "]")}}"""
    case GMulti(_, gs) =>
      s"""{"type":"GeometryCollection","geometries":${gs.map(toJson).mkString("[", ",", "]")}}"""
  }

  // ------------------------------------------------------------- reader

  /** Minimal recursive-descent JSON parser for the geometry subset
    * (objects, arrays, numbers, strings; whitespace-tolerant).
    */
  private final class P(val s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"GeoJSON: expected '$c' at $i")
      i += 1
    }
    def peek(): Char = { ws(); if (i < s.length) s.charAt(i) else '\u0000' }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        sb += s.charAt(i); i += 1
      }
      i += 1
      sb.toString
    }
    def number(): Double = {
      ws()
      val st = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(st, i).toDouble
    }
    def skipValue(): Unit = peek() match {
      case '{' =>
        expect('{'); var depth = 1
        while (depth > 0) {
          s.charAt(i) match {
            case '{' | '[' => depth += 1
            case '}' | ']' => depth -= 1
            case '"' => str(); i -= 1
            case _ => ()
          }
          i += 1
        }
      case '[' =>
        expect('['); var depth = 1
        while (depth > 0) {
          s.charAt(i) match {
            case '{' | '[' => depth += 1
            case '}' | ']' => depth -= 1
            case '"' => str(); i -= 1
            case _ => ()
          }
          i += 1
        }
      case '"' => str()
      case c if c == 'n' || c == 't' || c == 'f' => // null / true / false
        while (i < s.length && s.charAt(i).isLetter) i += 1
      case _ => number()
    }
  }

  private type Pos = (Double, Double, Double, Boolean)

  private def parsePos(p: P): Pos = {
    p.expect('[')
    val x = p.number()
    p.expect(',')
    val y = p.number()
    var z = 0.0; var hasZ = false
    if (p.peek() == ',') { p.expect(','); z = p.number(); hasZ = true }
    p.expect(']')
    (x, y, z, hasZ)
  }

  private def parseArray[T](p: P, elem: P => T): Seq[T] = {
    p.expect('[')
    val out = Seq.newBuilder[T]
    if (p.peek() != ']') {
      out += elem(p)
      while (p.peek() == ',') { p.expect(','); out += elem(p) }
    }
    p.expect(']')
    out.result()
  }

  private def lineOf(ps: Seq[Pos]): GLine = {
    val hasZ = ps.exists(_._4)
    val xy = new Array[Double](ps.length * 2)
    val z = if (hasZ) new Array[Double](ps.length) else null
    ps.zipWithIndex.foreach { case ((x, y, zz, _), k) =>
      xy(2 * k) = x; xy(2 * k + 1) = y
      if (hasZ) z(k) = zz
    }
    GLine(xy, z)
  }

  private def parseGeometry(p: P): Geom = {
    p.expect('{')
    var typ: String = null
    var geom: Geom = null
    var coordsAt = -1
    var geomsAt = -1
    var geometryAt = -1
    var featuresAt = -1
    var first = true
    while (p.peek() != '}') {
      if (!first) p.expect(',')
      first = false
      val key = p.str()
      p.expect(':')
      key match {
        case "type" => typ = p.str()
        case "coordinates" => coordsAt = p.i; p.skipValue()
        case "geometries" => geomsAt = p.i; p.skipValue()
        case "geometry" => geometryAt = p.i; p.skipValue()
        case "features" => featuresAt = p.i; p.skipValue()
        case _ => p.skipValue()
      }
    }
    p.expect('}')
    require(typ != null, "GeoJSON: missing type")
    // reparse the coordinates slice with a fresh cursor
    geom = typ match {
      case "Point" =>
        val q = cursorAt(p, coordsAt); val (x, y, z, hz) = parsePos(q)
        GPoint(x, y, z, hz)
      case "LineString" =>
        lineOf(parseArray(cursorAt(p, coordsAt), parsePos))
      case "Polygon" =>
        GPolygon(parseArray(cursorAt(p, coordsAt), q => lineOf(parseArray(q, parsePos))).toArray)
      case "MultiPoint" =>
        GMulti(4, parseArray(cursorAt(p, coordsAt), parsePos)
          .map { case (x, y, z, hz) => GPoint(x, y, z, hz): Geom }.toArray)
      case "MultiLineString" =>
        GMulti(5, parseArray(cursorAt(p, coordsAt), q => lineOf(parseArray(q, parsePos)): Geom).toArray)
      case "MultiPolygon" =>
        GMulti(6, parseArray(cursorAt(p, coordsAt),
          q => GPolygon(parseArray(q, qq => lineOf(parseArray(qq, parsePos))).toArray): Geom).toArray)
      case "GeometryCollection" =>
        GMulti(7, parseArray(cursorAt(p, geomsAt), parseGeometry).toArray)
      case "Feature" =>
        // RFC 7946 §3.2: a Feature wraps one geometry (possibly null —
        // an unlocated Feature maps to the empty collection)
        require(geometryAt >= 0, "GeoJSON: Feature without geometry")
        val q = cursorAt(p, geometryAt)
        q.ws()
        if (q.s.regionMatches(q.i, "null", 0, 4)) GMulti(7, Array.empty[Geom])
        else parseGeometry(q)
      case "FeatureCollection" =>
        require(featuresAt >= 0, "GeoJSON: FeatureCollection without features")
        GMulti(7, parseArray(cursorAt(p, featuresAt), parseGeometry).toArray)
      case other => throw new IllegalArgumentException(s"GeoJSON: unsupported type $other")
    }
    geom
  }

  // fresh cursor into the same backing string (used to reparse the
  // coordinates slice after the whole object has been scanned)
  private def cursorAt(p: P, at: Int): P = {
    val q = new P(p.s)
    q.i = at
    q
  }

  def fromJson(s: String): Geom = parseGeometry(new P(s))
}
