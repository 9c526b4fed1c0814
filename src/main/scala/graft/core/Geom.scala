package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal planar geometry model (hand-rolled: offline build, no JTS/GEOS).
  *
  * Mirrors the reference's OGR geometry classes
  * (`/root/reference/gdal/ogr/ogr_geometry.h`) for the slice the engine
  * needs: Point/LineString/Polygon + Multi* + GeometryCollection, optional
  * Z ordinate (needed by rasterize BURN_VALUE_FROM=Z,
  * `gdal/alg/gdalrasterize.cpp:465`). Wire format is WKB (OGC, little
  * endian, 2.5D flag 0x80000000 when Z present) and WKT, matching
  * `gdal/ogr/ogrgeometryfactory.cpp:81` createFromWkb / `:250` createFromWkt
  * semantics for these types.
  */
sealed trait Geom extends Serializable {
  def envelope: Envelope
  def hasZ: Boolean
  /** measure ordinate present (wkbHasM, `gdal/ogr/ogr_core.h:468`) */
  def hasM: Boolean
  /** flat WKB code 1..7 */
  def kind: Int
}

/** Axis-aligned bounding box (mirrors OGREnvelope, `gdal/ogr/ogr_core.h:96`). */
final case class Envelope(minX: Double, minY: Double, maxX: Double, maxY: Double) {
  def contains(x: Double, y: Double): Boolean =
    x >= minX && x <= maxX && y >= minY && y <= maxY
  def intersects(o: Envelope): Boolean =
    o.minX <= maxX && o.maxX >= minX && o.minY <= maxY && o.maxY >= minY
  def containsEnv(o: Envelope): Boolean =
    o.minX >= minX && o.maxX <= maxX && o.minY >= minY && o.maxY <= maxY
  def union(o: Envelope): Envelope =
    Envelope(math.min(minX, o.minX), math.min(minY, o.minY),
             math.max(maxX, o.maxX), math.max(maxY, o.maxY))
}

object Envelope {
  val empty: Envelope = Envelope(Double.MaxValue, Double.MaxValue, -Double.MaxValue, -Double.MaxValue)
  def ofCoords(xy: Array[Double]): Envelope = {
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    var i = 0
    while (i < xy.length) {
      val x = xy(i); val y = xy(i + 1)
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
      i += 2
    }
    Envelope(minX, minY, maxX, maxY)
  }
}

final case class GPoint(x: Double, y: Double, z: Double = 0.0, is3D: Boolean = false,
                        m: Double = 0.0, isMeasured: Boolean = false) extends Geom {
  def envelope: Envelope = Envelope(x, y, x, y)
  def hasZ: Boolean = is3D
  def hasM: Boolean = isMeasured
  def kind: Int = 1
}

/** A linestring (or, when closed, a ring). `xy` packed pairs; `z` null when 2D. */
final case class GLine(xy: Array[Double], z: Array[Double] = null,
                       m: Array[Double] = null) extends Geom {
  def numPoints: Int = xy.length / 2
  def x(i: Int): Double = xy(2 * i)
  def y(i: Int): Double = xy(2 * i + 1)
  def zAt(i: Int): Double = if (z == null) 0.0 else z(i)
  def mAt(i: Int): Double = if (m == null) 0.0 else m(i)
  lazy val envelope: Envelope = Envelope.ofCoords(xy)
  def hasZ: Boolean = z != null
  def hasM: Boolean = m != null
  def kind: Int = 2
  def isClosed: Boolean = numPoints >= 2 && x(0) == x(numPoints - 1) && y(0) == y(numPoints - 1)
}

/** Polygon: rings(0) = exterior, rest = holes. */
final case class GPolygon(rings: Array[GLine]) extends Geom {
  lazy val envelope: Envelope =
    if (rings.isEmpty) Envelope.empty
    else rings.foldLeft(Envelope.empty)((e, r) => e.union(r.envelope))
  def hasZ: Boolean = rings.exists(_.hasZ)
  def hasM: Boolean = rings.exists(_.hasM)
  def kind: Int = 3
  def exterior: GLine = rings(0)
}

final case class GMulti(multiKind: Int, geoms: Array[Geom]) extends Geom {
  // multiKind: 4=MultiPoint, 5=MultiLineString, 6=MultiPolygon, 7=GeometryCollection
  lazy val envelope: Envelope = geoms.foldLeft(Envelope.empty)((e, g) => e.union(g.envelope))
  def hasZ: Boolean = geoms.exists(_.hasZ)
  def hasM: Boolean = geoms.exists(_.hasM)
  def kind: Int = multiKind
}

object Geom {

  // ---------------------------------------------------------------- WKT ----

  def fromWkt(wkt: String): Geom = new WktParser(wkt).parse()

  def toWkt(g: Geom): String = {
    val sb = new StringBuilder(64)
    writeWkt(g, sb, top = true)
    sb.toString
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = java.lang.Double.toString(d)
      if (s.endsWith(".0")) s.dropRight(2) else s
    }

  private def writeCoord(sb: StringBuilder, x: Double, y: Double, z: Double,
                         hasZ: Boolean, m: Double = 0.0, hasM: Boolean = false): Unit = {
    sb.append(fmt(x)).append(' ').append(fmt(y))
    if (hasZ) sb.append(' ').append(fmt(z))
    if (hasM) sb.append(' ').append(fmt(m))
  }

  /** ISO WKT dimension marker: "" (XY / classic 2.5D XYZ), "M ", "ZM ". */
  private def dimMarker(hasZ: Boolean, hasM: Boolean): String =
    if (hasM && hasZ) "ZM " else if (hasM) "M " else ""

  private def writeLineBody(sb: StringBuilder, l: GLine, hasZ: Boolean,
                            hasM: Boolean = false): Unit = {
    sb.append('(')
    var i = 0
    while (i < l.numPoints) {
      if (i > 0) sb.append(',')
      writeCoord(sb, l.x(i), l.y(i), l.zAt(i), hasZ, l.mAt(i), hasM)
      i += 1
    }
    sb.append(')')
  }

  private def writePolyBody(sb: StringBuilder, p: GPolygon, hasZ: Boolean,
                            hasM: Boolean = false): Unit = {
    sb.append('(')
    var i = 0
    while (i < p.rings.length) {
      if (i > 0) sb.append(',')
      writeLineBody(sb, p.rings(i), hasZ, hasM)
      i += 1
    }
    sb.append(')')
  }

  private def writeWkt(g: Geom, sb: StringBuilder, top: Boolean): Unit = g match {
    case pt: GPoint if pt.x.isNaN && pt.y.isNaN =>
      // the empty-point convention is NaN coords; 'POINT (NaN NaN)' is
      // WKT our own parser rejects
      sb.append("POINT EMPTY")
    case pt: GPoint =>
      sb.append("POINT ").append(dimMarker(pt.is3D, pt.isMeasured)).append('(')
      writeCoord(sb, pt.x, pt.y, pt.z, pt.is3D, pt.m, pt.isMeasured); sb.append(')')
    case l: GLine if l.numPoints == 0 =>
      sb.append("LINESTRING EMPTY")
    case l: GLine =>
      sb.append("LINESTRING ").append(dimMarker(l.hasZ, l.hasM))
      writeLineBody(sb, l, l.hasZ, l.hasM)
    case p: GPolygon =>
      if (p.rings.isEmpty) sb.append("POLYGON EMPTY")
      else {
        sb.append("POLYGON ").append(dimMarker(p.hasZ, p.hasM))
        writePolyBody(sb, p, p.hasZ, p.hasM)
      }
    case m: GMulti =>
      val name = m.multiKind match {
        case 4 => "MULTIPOINT"; case 5 => "MULTILINESTRING"
        case 6 => "MULTIPOLYGON"; case _ => "GEOMETRYCOLLECTION"
      }
      sb.append(name).append(' ').append(dimMarker(m.hasZ, m.hasM))
      if (m.geoms.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.geoms.length) {
          if (i > 0) sb.append(',')
          m.multiKind match {
            case 4 =>
              // pad with the COLLECTION's dimension flags (like the line/
              // polygon branches) so mixed-dimension multipoints emit
              // uniform, reparseable coordinate tuples under one marker
              val pt = m.geoms(i).asInstanceOf[GPoint]
              sb.append('(')
              writeCoord(sb, pt.x, pt.y, pt.z, m.hasZ, pt.m, m.hasM)
              sb.append(')')
            case 5 => writeLineBody(sb, m.geoms(i).asInstanceOf[GLine], m.hasZ, m.hasM)
            case 6 => writePolyBody(sb, m.geoms(i).asInstanceOf[GPolygon], m.hasZ, m.hasM)
            case _ => writeWkt(m.geoms(i), sb, top = false)
          }
          i += 1
        }
        sb.append(')')
      }
  }

  private final class WktParser(s: String) {
    private var pos = 0
    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = { skipWs(); if (pos < s.length) s.charAt(pos) else '\u0000' }
    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c)
        throw new IllegalArgumentException(s"WKT parse error at $pos in '$s': expected '$c'")
      pos += 1
    }
    private def word(): String = {
      skipWs(); val start = pos
      while (pos < s.length && (s.charAt(pos).isLetter || s.charAt(pos) == '_')) pos += 1
      s.substring(start, pos).toUpperCase
    }
    private def number(): Double = {
      skipWs(); val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      java.lang.Double.parseDouble(s.substring(start, pos))
    }

    /** coords like "x y [z] [m], x y [z] [m], …" up to ')' */
    /** Per-point extras after x y, honoring an explicit dimension marker
      * ("Z"/"M"/"ZM") or inferring classic unmarked forms: 3 numbers = XYZ
      * (2.5D), 4 numbers = XYZM — `ogrgeometryfactory.cpp:250`
      * createFromWkt conventions.
      */
    private def coordSeq(markZ: Boolean, markM: Boolean, marked: Boolean): GLine = {
      val xs = new scala.collection.mutable.ArrayBuffer[Double](16)
      val zs = new scala.collection.mutable.ArrayBuffer[Double](8)
      val ms = new scala.collection.mutable.ArrayBuffer[Double](8)
      var anyZ = false; var anyM = false
      var done = false
      while (!done) {
        xs += number(); xs += number()
        if (marked) {
          if (markZ) { zs += number(); anyZ = true } else zs += 0.0
          if (markM) { ms += number(); anyM = true } else ms += 0.0
        } else {
          var c = peek
          if (c != ',' && c != ')') { zs += number(); anyZ = true } else zs += 0.0
          c = peek
          if (c != ',' && c != ')') { ms += number(); anyM = true } else ms += 0.0
        }
        if (peek == ',') { pos += 1 } else done = true
      }
      GLine(xs.toArray, if (anyZ) zs.toArray else null,
        if (anyM) ms.toArray else null)
    }

    private def parenLine(markZ: Boolean, markM: Boolean, marked: Boolean): GLine = {
      expect('('); val l = coordSeq(markZ, markM, marked); expect(')'); l
    }

    private def polygonBody(markZ: Boolean, markM: Boolean, marked: Boolean): GPolygon = {
      expect('(')
      val rings = new scala.collection.mutable.ArrayBuffer[GLine](4)
      rings += parenLine(markZ, markM, marked)
      while (peek == ',') { pos += 1; rings += parenLine(markZ, markM, marked) }
      expect(')')
      GPolygon(rings.toArray)
    }

    private def isEmpty(): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, "EMPTY", 0, 5)) { pos += 5; true } else false
    }

    def parse(): Geom = {
      val w = word()
      // optional dimension marker — captured, not just skipped
      skipWs()
      var markZ = false; var markM = false; var marked = false
      if (s.regionMatches(true, pos, "ZM", 0, 2) &&
        (pos + 2 >= s.length || !s.charAt(pos + 2).isLetterOrDigit)) {
        pos += 2; markZ = true; markM = true; marked = true
      } else if (pos < s.length && (s.charAt(pos) == 'Z' || s.charAt(pos) == 'z') &&
        (pos + 1 >= s.length || !s.charAt(pos + 1).isLetterOrDigit)) {
        pos += 1; markZ = true; marked = true
      } else if (pos < s.length && (s.charAt(pos) == 'M' || s.charAt(pos) == 'm') &&
        (pos + 1 >= s.length || !s.charAt(pos + 1).isLetterOrDigit)) {
        pos += 1; markM = true; marked = true
      }
      w match {
        case "POINT" =>
          if (isEmpty()) GPoint(Double.NaN, Double.NaN)
          else {
            expect('(')
            val l = coordSeq(markZ, markM, marked)
            expect(')')
            GPoint(l.x(0), l.y(0), l.zAt(0), l.hasZ, l.mAt(0), l.hasM)
          }
        case "LINESTRING" =>
          if (isEmpty()) GLine(Array.empty[Double])
          else parenLine(markZ, markM, marked)
        case "POLYGON" =>
          if (isEmpty()) GPolygon(Array.empty[GLine])
          else polygonBody(markZ, markM, marked)
        case "MULTIPOINT" =>
          if (isEmpty()) GMulti(4, Array.empty[Geom])
          else {
            expect('(')
            val pts = new scala.collection.mutable.ArrayBuffer[Geom](8)
            var done = false
            while (!done) {
              val wrapped = peek == '('
              if (wrapped) pos += 1
              val x = number(); val y = number()
              var z = 0.0; var mv = 0.0; var has3 = false; var hasMv = false
              if (marked) {
                if (markZ) { z = number(); has3 = true }
                if (markM) { mv = number(); hasMv = true }
              } else {
                if (peek != ')' && peek != ',') { z = number(); has3 = true }
                if (peek != ')' && peek != ',') { mv = number(); hasMv = true }
              }
              if (wrapped) expect(')')
              pts += GPoint(x, y, z, has3, mv, hasMv)
              if (peek == ',') pos += 1 else done = true
            }
            expect(')')
            GMulti(4, pts.toArray)
          }
        case "MULTILINESTRING" =>
          if (isEmpty()) GMulti(5, Array.empty[Geom])
          else {
            expect('(')
            val ls = new scala.collection.mutable.ArrayBuffer[Geom](4)
            ls += parenLine(markZ, markM, marked)
            while (peek == ',') { pos += 1; ls += parenLine(markZ, markM, marked) }
            expect(')')
            GMulti(5, ls.toArray)
          }
        case "MULTIPOLYGON" =>
          if (isEmpty()) GMulti(6, Array.empty[Geom])
          else {
            expect('(')
            val ps = new scala.collection.mutable.ArrayBuffer[Geom](4)
            ps += polygonBody(markZ, markM, marked)
            while (peek == ',') { pos += 1; ps += polygonBody(markZ, markM, marked) }
            expect(')')
            GMulti(6, ps.toArray)
          }
        case "GEOMETRYCOLLECTION" =>
          if (isEmpty()) GMulti(7, Array.empty[Geom])
          else {
            expect('(')
            val gs = new scala.collection.mutable.ArrayBuffer[Geom](4)
            gs += parse()
            while (peek == ',') { pos += 1; gs += parse() }
            expect(')')
            GMulti(7, gs.toArray)
          }
        case other => throw new IllegalArgumentException(s"WKT: unsupported type '$other'")
      }
    }
  }

  // ---------------------------------------------------------------- WKB ----

  private val Z_FLAG = 0x80000000 // OGC 2.5D bit (wkb25DBit, gdal/ogr/ogr_core.h:361)

  def toWkb(g: Geom): Array[Byte] = {
    val buf = ByteBuffer.allocate(wkbSize(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeWkb(g, buf)
    buf.array()
  }

  private def ptBytes(hasZ: Boolean, hasM: Boolean): Int =
    16 + (if (hasZ) 8 else 0) + (if (hasM) 8 else 0)

  private def wkbSize(g: Geom): Int = g match {
    case p: GPoint => 5 + ptBytes(p.is3D, p.isMeasured)
    case l: GLine  => 9 + l.numPoints * ptBytes(l.hasZ, l.hasM)
    case p: GPolygon =>
      9 + p.rings.map(r => 4 + r.numPoints * ptBytes(p.hasZ, p.hasM)).sum
    case m: GMulti => 9 + m.geoms.map(wkbSize).sum
  }

  private def writeWkb(g: Geom, buf: ByteBuffer): Unit = {
    buf.put(1.toByte) // little endian
    val hasZ = g.hasZ
    val hasM = g.hasM
    // XY and classic 2.5D keep the legacy OGC encoding (byte-stable for
    // all pre-M geometries); M geometries use the ISO 2000/3000 codes
    // (wkbVariantIso, like the reference when M is present)
    buf.putInt(
      if (hasM && hasZ) g.kind + 3000
      else if (hasM) g.kind + 2000
      else if (hasZ) g.kind | Z_FLAG
      else g.kind)
    g match {
      case p: GPoint =>
        buf.putDouble(p.x).putDouble(p.y)
        if (hasZ) buf.putDouble(p.z)
        if (hasM) buf.putDouble(p.m)
      case l: GLine =>
        buf.putInt(l.numPoints)
        var i = 0
        while (i < l.numPoints) {
          buf.putDouble(l.x(i)).putDouble(l.y(i))
          if (hasZ) buf.putDouble(l.zAt(i))
          if (hasM) buf.putDouble(l.mAt(i))
          i += 1
        }
      case p: GPolygon =>
        buf.putInt(p.rings.length)
        var r = 0
        while (r < p.rings.length) {
          val ring = p.rings(r)
          buf.putInt(ring.numPoints)
          var i = 0
          while (i < ring.numPoints) {
            buf.putDouble(ring.x(i)).putDouble(ring.y(i))
            if (hasZ) buf.putDouble(ring.zAt(i))
            if (hasM) buf.putDouble(ring.mAt(i))
            i += 1
          }
          r += 1
        }
      case m: GMulti =>
        buf.putInt(m.geoms.length)
        m.geoms.foreach(writeWkb(_, buf))
    }
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    readWkb(buf)
  }

  private def readWkb(buf: ByteBuffer): Geom = {
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt()
    // accept the OGC 2.5D flag, the EWKB M flag (0x40000000), and the ISO
    // 1000/2000/3000 ranges (Z / M / ZM — wkbHasZ/wkbHasM, ogr_core.h:460)
    val dimCode = (rawType & 0x0fffffff) / 1000
    val hasZ = (rawType & Z_FLAG) != 0 || dimCode == 1 || dimCode == 3
    val hasM = (rawType & 0x40000000) != 0 || dimCode == 2 || dimCode == 3
    val flat = (rawType & 0x0fffffff) % 1000
    flat match {
      case 1 =>
        val x = buf.getDouble; val y = buf.getDouble
        val z = if (hasZ) buf.getDouble else 0.0
        val m = if (hasM) buf.getDouble else 0.0
        GPoint(x, y, z, hasZ, m, hasM)
      case 2 => readLine(buf, hasZ, hasM)
      case 3 => readPolygon(buf, hasZ, hasM)
      case k if k >= 4 && k <= 7 =>
        val n = buf.getInt
        val gs = new Array[Geom](n)
        var i = 0
        while (i < n) { gs(i) = readWkb(buf); i += 1 }
        GMulti(k, gs)
      case other => throw new IllegalArgumentException(s"WKB: unsupported geometry type $other")
    }
  }

  private def readLine(buf: ByteBuffer, hasZ: Boolean, hasM: Boolean): GLine = {
    val n = buf.getInt
    val xy = new Array[Double](2 * n)
    val z = if (hasZ) new Array[Double](n) else null
    val m = if (hasM) new Array[Double](n) else null
    var i = 0
    while (i < n) {
      xy(2 * i) = buf.getDouble; xy(2 * i + 1) = buf.getDouble
      if (hasZ) z(i) = buf.getDouble
      if (hasM) m(i) = buf.getDouble
      i += 1
    }
    GLine(xy, z, m)
  }

  private def readPolygon(buf: ByteBuffer, hasZ: Boolean, hasM: Boolean): GPolygon = {
    val nr = buf.getInt
    val rings = new Array[GLine](nr)
    var r = 0
    while (r < nr) { rings(r) = readLine(buf, hasZ, hasM); r += 1 }
    GPolygon(rings)
  }
}
