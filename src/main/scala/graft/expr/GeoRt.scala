package graft.expr

import graft.core._
import graft.index.CellGrid

/** Runtime kernels invoked from generated code (Scala top-level object =>
  * static forwarders callable from Janino-generated Java).
  *
  * The decoded-geometry cache reproduces the reference's prepared-geometry
  * reuse (`/root/reference/gdal/ogr/ogrsf_frmts/generic/ogrlayer.cpp:1296`
  * InstallFilter keeps a prepared filter geometry for the whole scan): a
  * broadcast polygon arrives at an executor as one byte[] instance that is
  * compared by identity first, so repeated rows hit the decoded form.
  */
object GeoRt {

  private final val CacheSlots = 64

  private final class Slot {
    var key: Array[Byte] = _
    var value: Geom = _
  }

  private val cache = new ThreadLocal[Array[Slot]] {
    override def initialValue(): Array[Slot] = Array.fill(CacheSlots)(new Slot)
  }

  def decode(wkb: Array[Byte]): Geom = {
    val slots = cache.get()
    // slot by cheap content hash
    var h = wkb.length
    if (wkb.length >= 8) {
      h = h * 31 + wkb(5); h = h * 31 + wkb(wkb.length - 3)
      h = h * 31 + wkb(wkb.length / 2)
    }
    val slot = slots(h & (CacheSlots - 1))
    val k = slot.key
    if (k != null && ((k eq wkb) || java.util.Arrays.equals(k, wkb))) return slot.value
    val g = Geom.fromWkb(wkb)
    slot.key = wkb
    slot.value = g
    g
  }

  // ---- predicates (hot path: cell-join post-filter) ----

  def containsPoint(wkb: Array[Byte], x: Double, y: Double): Boolean =
    GeomOps.containsPoint(decode(wkb), x, y)

  def intersectsPoint(wkb: Array[Byte], x: Double, y: Double): Boolean =
    GeomOps.intersectsPoint(decode(wkb), x, y)

  def intersects(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomOps.intersects(decode(a), decode(b))

  def contains(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomOps.contains(decode(a), decode(b))

  def dwithin(a: Array[Byte], b: Array[Byte], d: Double): Boolean =
    GeomOps.distance(decode(a), decode(b)) <= d

  // ---- measures ----

  def area(wkb: Array[Byte]): Double = GeomOps.area(decode(wkb))
  def length(wkb: Array[Byte]): Double = GeomOps.length(decode(wkb))
  def distance(a: Array[Byte], b: Array[Byte]): Double =
    GeomOps.distance(decode(a), decode(b))

  /** Great-circle distance in meters on the WGS84 mean sphere. */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val R = 6371008.8
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1; val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  // ---- accessors / constructors ----

  def point(x: Double, y: Double): Array[Byte] = Geom.toWkb(GPoint(x, y))
  def x(wkb: Array[Byte]): Double = decode(wkb) match {
    case p: GPoint => p.x
    case g => GeomOps.centroid(g)._1
  }
  def y(wkb: Array[Byte]): Double = decode(wkb) match {
    case p: GPoint => p.y
    case g => GeomOps.centroid(g)._2
  }

  def geometryType(wkb: Array[Byte]): String = decode(wkb) match {
    case _: GPoint => "POINT"
    case _: GLine => "LINESTRING"
    case _: GPolygon => "POLYGON"
    case GMulti(4, _) => "MULTIPOINT"
    case GMulti(5, _) => "MULTILINESTRING"
    case GMulti(6, _) => "MULTIPOLYGON"
    case GMulti(_, _) => "GEOMETRYCOLLECTION"
  }

  def numPoints(wkb: Array[Byte]): Int = {
    def count(g: Geom): Int = g match {
      case _: GPoint => 1
      case l: GLine => l.numPoints
      case p: GPolygon => p.rings.map(_.numPoints).sum
      case m: GMulti => m.geoms.map(count).sum
    }
    count(decode(wkb))
  }

  // ---- cell index ----

  def cellOf(lon: Double, lat: Double, res: Int): Long = CellGrid.cellId(lon, lat, res)
  def cellParent(cell: Long): Long = CellGrid.parent(cell)

  def cellsCovering(wkb: Array[Byte], res: Int): Array[Long] =
    CellGrid.polyfill(decode(wkb), res)

  // ---- SRS transforms (hand-rolled WGS84 <-> WebMercator slice of
  //      OGRCoordinateTransformation, gdal/ogr/ogrct.cpp:905) ----

  private final val EarthRadius = 6378137.0

  def lonToMercX(lon: Double): Double = EarthRadius * math.toRadians(lon)
  def latToMercY(lat: Double): Double = {
    val clamped = math.max(-85.06, math.min(85.06, lat))
    EarthRadius * math.log(math.tan(math.Pi / 4 + math.toRadians(clamped) / 2))
  }
  def mercXToLon(x: Double): Double = math.toDegrees(x / EarthRadius)
  def mercYToLat(y: Double): Double =
    math.toDegrees(2 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2)

  /** st_transform: 4326<->3857 via the exact spherical web-mercator maps
    * (kept byte-stable for the warp/reproject goldens), every other pair
    * through the general [[graft.core.Proj]] engine (TMerc/UTM, LCC 2SP,
    * polar stereographic, LAEA, Helmert datum shifts — the common-EPSG
    * slice of `gdal/ogr/ogrct.cpp:905`).
    */
  def transform(wkb: Array[Byte], srcSrid: Int, dstSrid: Int): Array[Byte] = {
    if (srcSrid == dstSrid) return wkb
    val fn: (Double, Double) => (Double, Double) = (srcSrid, dstSrid) match {
      case (4326, 3857) => (x, y) => (lonToMercX(x), latToMercY(y))
      case (3857, 4326) => (x, y) => (mercXToLon(x), mercYToLat(y))
      case _ =>
        val src = graft.core.Proj.byEpsg(srcSrid)
        val dst = graft.core.Proj.byEpsg(dstSrid)
        (src, dst) match {
          case (Some(s), Some(d)) =>
            (x, y) => graft.core.Proj.transformPoint(s, d, x, y)
          case _ => throw new IllegalArgumentException(
            s"st_transform: unsupported SRID pair $srcSrid -> $dstSrid " +
              "(supported: 4326<->3857 spherical; general: 4326/4258/4277, " +
              "UTM 326xx/327xx/258xx, 27700, 2154, 3413, 3031, 5041, 5042, 3035)")
        }
    }
    Geom.toWkb(mapCoords(decode(wkb), fn))
  }

  /** Apply a coordinate map to every vertex of a geometry. */
  private def mapCoords(g: Geom, fn: (Double, Double) => (Double, Double)): Geom =
    g match {
      case p: GPoint => val (nx, ny) = fn(p.x, p.y); p.copy(x = nx, y = ny)
      case l: GLine =>
        val out = new Array[Double](l.xy.length)
        var i = 0
        while (i < l.numPoints) {
          val (nx, ny) = fn(l.x(i), l.y(i)); out(2 * i) = nx; out(2 * i + 1) = ny; i += 1
        }
        GLine(out, l.z, l.m)
      case p: GPolygon =>
        GPolygon(p.rings.map(r => mapCoords(r, fn).asInstanceOf[GLine]))
      case m: GMulti => GMulti(m.multiKind, m.geoms.map(mapCoords(_, fn)))
    }

  /** st_transform_srs: arbitrary SRS definitions (PROJ.4 string, WKT1, or
    * "EPSG:n") through [[graft.core.SrsParse]] — the engine's
    * `importFromProj4`/`importFromWkt` front-end
    * (`gdal/ogr/ogrct.cpp:122` OGRProj4CT over parsed OGRSpatialReference).
    * Parses are cached, so per-row cost is the projection math only.
    */
  def transformSrs(wkb: Array[Byte], srcSrs: String, dstSrs: String): Array[Byte] = {
    if (srcSrs == dstSrs) return wkb
    val src = graft.core.SrsParse.parse(srcSrs)
    val dst = graft.core.SrsParse.parse(dstSrs)
    Geom.toWkb(mapCoords(decode(wkb),
      (x, y) => graft.core.Proj.transformPoint(src, dst, x, y)))
  }
}
