package graft.core

/** GML 2 geometry reader/writer — the engine's slice of
  * `OGRGeometryFactory::createFromGML` (`gdal/ogr/ogrgeometryfactory.cpp:1755`)
  * and `OGR_G_ExportToGML`. Writer emits GML2 (`gml:coordinates` with
  * "x,y x,y" tuples, outer/innerBoundaryIs); reader additionally accepts
  * GML3 `gml:posList` / `gml:pos` (space-separated, exterior/interior),
  * prefix-insensitively. Z is carried as a third tuple member.
  */
object Gml {

  private def num(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def tuple(x: Double, y: Double, z: Double, hasZ: Boolean): String =
    if (hasZ) s"${num(x)},${num(y)},${num(z)}" else s"${num(x)},${num(y)}"

  private def coords(l: GLine): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < l.numPoints) {
      if (i > 0) sb += ' '
      sb ++= tuple(l.x(i), l.y(i), if (l.z != null) l.z(i) else 0.0, l.z != null)
      i += 1
    }
    sb.toString
  }

  private def ringGml(l: GLine): String =
    s"<gml:LinearRing><gml:coordinates>${coords(l)}</gml:coordinates></gml:LinearRing>"

  def toGml(g: Geom): String = g match {
    case pt: GPoint =>
      s"<gml:Point><gml:coordinates>${tuple(pt.x, pt.y, pt.z, pt.is3D)}</gml:coordinates></gml:Point>"
    case l: GLine =>
      s"<gml:LineString><gml:coordinates>${coords(l)}</gml:coordinates></gml:LineString>"
    case p: GPolygon =>
      val outer = s"<gml:outerBoundaryIs>${ringGml(p.rings(0))}</gml:outerBoundaryIs>"
      val inner = p.rings.drop(1)
        .map(r => s"<gml:innerBoundaryIs>${ringGml(r)}</gml:innerBoundaryIs>").mkString
      s"<gml:Polygon>$outer$inner</gml:Polygon>"
    case GMulti(4, gs) =>
      gs.map(g => s"<gml:pointMember>${toGml(g)}</gml:pointMember>")
        .mkString("<gml:MultiPoint>", "", "</gml:MultiPoint>")
    case GMulti(5, gs) =>
      gs.map(g => s"<gml:lineStringMember>${toGml(g)}</gml:lineStringMember>")
        .mkString("<gml:MultiLineString>", "", "</gml:MultiLineString>")
    case GMulti(6, gs) =>
      gs.map(g => s"<gml:polygonMember>${toGml(g)}</gml:polygonMember>")
        .mkString("<gml:MultiPolygon>", "", "</gml:MultiPolygon>")
    case GMulti(_, gs) =>
      gs.map(g => s"<gml:geometryMember>${toGml(g)}</gml:geometryMember>")
        .mkString("<gml:GeometryCollection>", "", "</gml:GeometryCollection>")
  }

  // ------------------------------------------------------------- reader

  /** Tiny tag scanner: returns (localName, attrs, contentStart, contentEnd,
    * tagEnd) of the first element at or after `from`, or null.
    */
  private final case class Tag(name: String, start: Int, contentStart: Int,
                               contentEnd: Int, end: Int)

  private def local(n: String): String = {
    val c = n.indexOf(':')
    (if (c >= 0) n.substring(c + 1) else n).toLowerCase
  }

  /** Find the next opening tag at or after `from` within [from, until). */
  private def nextTag(s: String, from: Int, until: Int): Tag = {
    var i = from
    while (i < until) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt >= until) return null
      if (lt + 1 < until && s.charAt(lt + 1) != '/') {
        var j = lt + 1
        while (j < until && s.charAt(j) != '>' && s.charAt(j) != ' ' &&
          s.charAt(j) != '/') j += 1
        val rawName = s.substring(lt + 1, j)
        var gt = s.indexOf('>', j)
        if (gt < 0) return null
        if (s.charAt(gt - 1) == '/') // self-closing
          return Tag(local(rawName), lt, gt + 1, gt + 1, gt + 1)
        // find matching close tag (handles nesting of the same name)
        val open = "<" + rawName
        val close = "</" + rawName + ">"
        var depth = 1
        var k = gt + 1
        while (depth > 0) {
          val no = s.indexOf(open, k)
          val nc = s.indexOf(close, k)
          require(nc >= 0, s"GML: unclosed <$rawName>")
          if (no >= 0 && no < nc &&
            (s.charAt(no + open.length) == '>' || s.charAt(no + open.length) == ' ')) {
            depth += 1; k = no + open.length
          } else { depth -= 1; k = nc + close.length }
        }
        return Tag(local(rawName), lt, gt + 1, k - close.length, k)
      }
      i = lt + 1
    }
    null
  }

  private def childTags(s: String, from: Int, until: Int): Seq[Tag] = {
    val out = Seq.newBuilder[Tag]
    var i = from
    var t = nextTag(s, i, until)
    while (t != null) {
      out += t
      i = t.end
      t = nextTag(s, i, until)
    }
    out.result()
  }

  private def firstNamed(s: String, from: Int, until: Int, names: Set[String]): Tag =
    childTags(s, from, until).find(t => names.contains(t.name)).orNull

  /** Parse positions from either a `coordinates` ("x,y x,y") or
    * `posList`/`pos` (space-separated flat list) child element.
    */
  private def parsePositions(s: String, from: Int, until: Int): GLine = {
    val t = firstNamed(s, from, until, Set("coordinates", "poslist", "pos"))
    require(t != null, "GML: no coordinates/posList")
    val body = s.substring(t.contentStart, t.contentEnd).trim
    if (t.name == "coordinates") {
      val tuples = body.split("\\s+").filter(_.nonEmpty)
      val hasZ = tuples.headOption.exists(_.count(_ == ',') >= 2)
      val xy = new Array[Double](tuples.length * 2)
      val z = if (hasZ) new Array[Double](tuples.length) else null
      tuples.zipWithIndex.foreach { case (tp, k) =>
        val parts = tp.split(',')
        xy(2 * k) = parts(0).toDouble; xy(2 * k + 1) = parts(1).toDouble
        if (hasZ) z(k) = parts(2).toDouble
      }
      GLine(xy, z)
    } else {
      // posList/pos: flat numbers; dimension from srsDimension attr if
      // present in the raw tag text, else 2
      val head = s.substring(t.start, t.contentStart)
      val dim = "srsDimension=\"(\\d)\"".r.findFirstMatchIn(head)
        .map(_.group(1).toInt).getOrElse(2)
      val ns = body.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
      val n = ns.length / dim
      val xy = new Array[Double](n * 2)
      val z = if (dim >= 3) new Array[Double](n) else null
      var k = 0
      while (k < n) {
        xy(2 * k) = ns(k * dim); xy(2 * k + 1) = ns(k * dim + 1)
        if (dim >= 3) z(k) = ns(k * dim + 2)
        k += 1
      }
      GLine(xy, z)
    }
  }

  private def parseElement(s: String, t: Tag): Geom = t.name match {
    case "point" =>
      val l = parsePositions(s, t.contentStart, t.contentEnd)
      GPoint(l.x(0), l.y(0), if (l.z != null) l.z(0) else 0.0, l.z != null)
    case "linestring" | "linearring" =>
      parsePositions(s, t.contentStart, t.contentEnd)
    case "curve" =>
      // GML3 Curve: gml:segments holding LineStringSegment children —
      // concatenate their positions in document order
      val seg = firstNamed(s, t.contentStart, t.contentEnd, Set("segments"))
      if (seg == null) parsePositions(s, t.contentStart, t.contentEnd)
      else {
        val parts = childTags(s, seg.contentStart, seg.contentEnd)
          .filter(c => c.name == "linestringsegment" || c.name == "linestring")
          .map(c => parsePositions(s, c.contentStart, c.contentEnd))
        require(parts.nonEmpty, "GML: Curve without LineStringSegment")
        val hasZ = parts.exists(_.z != null)
        val xy = parts.flatMap(_.xy).toArray
        val z = if (hasZ) parts.flatMap(p =>
          if (p.z != null) p.z.toSeq else Seq.fill(p.numPoints)(0.0)).toArray
        else null
        GLine(xy, z)
      }
    case "surface" =>
      // GML3 Surface: gml:patches → first PolygonPatch parsed as a polygon
      val patches = firstNamed(s, t.contentStart, t.contentEnd, Set("patches"))
      require(patches != null, "GML: Surface without patches")
      val patch = firstNamed(s, patches.contentStart, patches.contentEnd,
        Set("polygonpatch", "rectangle", "triangle"))
      require(patch != null, "GML: Surface without PolygonPatch")
      parseElement(s, Tag("polygon", patch.start, patch.contentStart,
        patch.contentEnd, patch.end))
    case "polygon" =>
      var outer: GLine = null
      val inner = Seq.newBuilder[GLine]
      childTags(s, t.contentStart, t.contentEnd).foreach { c =>
        if (Set("outerboundaryis", "exterior", "innerboundaryis", "interior")
          .contains(c.name)) {
          val ring = firstNamed(s, c.contentStart, c.contentEnd, Set("linearring"))
          require(ring != null, s"GML: boundary without LinearRing")
          val l = parsePositions(s, ring.contentStart, ring.contentEnd)
          if (c.name == "outerboundaryis" || c.name == "exterior") outer = l
          else inner += l
        }
      }
      require(outer != null, "GML: polygon without outer boundary")
      GPolygon((outer +: inner.result()).toArray)
    case "multipoint" | "multilinestring" | "multipolygon" |
         "multicurve" | "multisurface" | "geometrycollection" =>
      val kind = t.name match {
        case "multipoint" => 4
        case "multilinestring" | "multicurve" => 5
        case "multipolygon" | "multisurface" => 6
        case _ => 7
      }
      val members = Seq.newBuilder[Geom]
      childTags(s, t.contentStart, t.contentEnd).foreach { m =>
        val inner = nextTag(s, m.contentStart, m.contentEnd)
        if (inner != null) members += parseElement(s, inner)
      }
      GMulti(kind, members.result().toArray)
    case other => throw new IllegalArgumentException(s"GML: unsupported <$other>")
  }

  def fromGml(s: String): Geom = {
    val t = nextTag(s, 0, s.length)
    require(t != null, "GML: no element")
    parseElement(s, t)
  }
}
