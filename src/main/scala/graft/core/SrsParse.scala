package graft.core

import Proj._

/** SRS definition front-end: parse PROJ.4 strings (`+proj=tmerc +lat_0=…`)
  * and OGC WKT1 (`PROJCS[…]`) into [[Proj.Crs]] parameters for the
  * existing projection kernels — the engine's slice of
  * `OGRSpatialReference::importFromProj4` / `importFromWkt`
  * (`/root/reference/gdal/ogr/ogr_srs_proj4.cpp`,
  * `ogr_srs_xml.cpp`; consumed by OGRProj4CT, `gdal/ogr/ogrct.cpp:122`).
  *
  * Supported projections are exactly the kernel set: longlat, utm, tmerc,
  * lcc (2SP; 1SP only when it degenerates to lat_1=lat_2 with k=1), stere
  * in the polar aspect, laea, aea. Datum handling: +towgs84 / TOWGS84[…]
  * 3- or 7-parameter Helmert, +datum={WGS84,NAD83,OSGB36}, named WKT
  * datums with a TOWGS84 node. Linear units: +units=m/ft/us-ft/km or
  * +to_meter=, WKT1 PROJCS UNIT factors (false easting/northing converted
  * from the unit, coordinates exchanged in it — state-plane feet), WKT2
  * per-parameter and per-axis LENGTHUNIT. Anything else fails loudly.
  */
object SrsParse {

  // Bounded: st_transform_srs can feed per-row column values, so an
  // unbounded memo would grow executor heap for the life of the JVM on
  // high-cardinality SRS columns. Real workloads use a handful of SRSs;
  // on overflow we drop the whole map (cheap, and refill is just parsing).
  private val CacheCap = 4096
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Crs]()

  /** Dispatch on the definition shape: `EPSG:n` / bare integer → the EPSG
    * table; leading `+` → PROJ.4; `PROJCS[`/`GEOGCS[` → WKT1.
    */
  def parse(defn: String): Crs = {
    val key = defn.trim
    val hit = cache.get(key)
    if (hit != null) return hit
    val crs =
      if (key.toUpperCase.startsWith("EPSG:"))
        byEpsg(key.substring(5).trim.toInt).getOrElse(
          throw new IllegalArgumentException(s"unknown EPSG code in '$key'"))
      else if (key.forall(_.isDigit) && key.nonEmpty)
        byEpsg(key.toInt).getOrElse(
          throw new IllegalArgumentException(s"unknown EPSG code $key"))
      else if (key.startsWith("+")) fromProj4(key)
      else if (Seq("PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS", "GEODCRS",
        "BOUNDCRS").exists(key.toUpperCase.startsWith)) fromWkt(key)
      else throw new IllegalArgumentException(
        s"unrecognized SRS definition: '${key.take(60)}'")
    if (cache.size >= CacheCap) cache.clear()
    cache.put(key, crs)
    crs
  }

  // ------------------------------------------------------------- PROJ.4

  private val namedEllipsoids: Map[String, Ellipsoid] = Map(
    "wgs84" -> WGS84, "grs80" -> GRS80, "airy" -> Airy1830,
    "intl" -> Intl1924, "clrk66" -> Clarke1866)

  def fromProj4(s: String): Crs = {
    val kv = scala.collection.mutable.Map[String, String]()
    s.trim.split("\\s+").foreach { tok =>
      if (tok.startsWith("+")) {
        val body = tok.substring(1)
        val eq = body.indexOf('=')
        if (eq >= 0) kv(body.substring(0, eq).toLowerCase) = body.substring(eq + 1)
        else kv(body.toLowerCase) = ""
      }
    }
    def num(k: String, default: Double): Double =
      kv.get(k).map(_.toDouble).getOrElse(default)
    def numOpt(k: String): Option[Double] = kv.get(k).map(_.toDouble)

    // Reject keys that would change the result if ignored (fail-loudly
    // contract): every key is either consumed by the dispatch below,
    // known-benign, or an error. `+pm=`, `+to_meter=`, `+nadgrids=`,
    // `+axis=` are accepted only at their identity values.
    val consumed = Set("proj", "zone", "south", "lat_0", "lat_1", "lat_2",
      "lat_ts", "lon_0", "k", "k_0", "x_0", "y_0", "a", "b", "rf", "f",
      "ellps", "datum", "towgs84", "units", "no_defs", "wktext", "type")
    kv.get("pm").foreach(v => require(v.toLowerCase == "greenwich" || v == "0",
      s"only the Greenwich prime meridian is supported, got +pm=$v"))
    kv.get("nadgrids").foreach(v => require(v == "@null",
      s"grid-shift files are unsupported, got +nadgrids=$v"))
    kv.get("axis").foreach(v => require(v == "enu",
      s"only the default enu axis order is supported, got +axis=$v"))
    val unknown = kv.keySet -- consumed -- Set("pm", "to_meter", "nadgrids", "axis")
    require(unknown.isEmpty,
      s"unsupported PROJ.4 key(s): ${unknown.toSeq.sorted.map("+" + _).mkString(", ")}")

    // ellipsoid: explicit +a/+rf|+b|+f > +ellps > +datum implication > WGS84
    val datum = kv.get("datum").map(_.toLowerCase)
    datum.foreach { d =>
      require(Set("wgs84", "nad83", "osgb36").contains(d),
        s"unsupported +datum=$d (supported: WGS84, NAD83, OSGB36; " +
          "spell others as +ellps/+a/+rf with +towgs84)")
    }
    val ell: Ellipsoid = (numOpt("a"), kv.get("ellps")) match {
      case (Some(a), _) =>
        val invF = numOpt("rf").orElse(numOpt("f").map(f => if (f == 0) 0.0 else 1.0 / f))
          .orElse(numOpt("b").map(b => if (b == a) 0.0 else a / (a - b)))
          .getOrElse(0.0)
        Ellipsoid(a, invF)
      case (None, Some(name)) =>
        namedEllipsoids.getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"unknown +ellps=$name " +
            s"(supported: ${namedEllipsoids.keys.mkString(", ")})"))
      case (None, None) => datum match {
        case Some("nad83") => GRS80
        case Some("osgb36") => Airy1830
        case _ => WGS84
      }
    }

    // datum shift to WGS84: +towgs84 wins, then +datum, else none
    val toWgs84: Option[Helmert] = kv.get("towgs84") match {
      case Some(v) =>
        val p = v.split(",").map(_.trim.toDouble)
        require(p.length == 3 || p.length == 7,
          s"+towgs84 needs 3 or 7 parameters, got ${p.length}")
        val h =
          if (p.length == 3) Helmert(p(0), p(1), p(2), 0, 0, 0, 0)
          else Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6))
        if (p.forall(_ == 0.0)) None else Some(h)
      case None => datum match {
        case Some("osgb36") => Some(Osgb36ToWgs84)
        case _ => None // WGS84 / NAD83 / unspecified: no shift
      }
    }

    // projected-unit factor (PROJ fr_meter semantics: +x_0/+y_0 stay in
    // metres, only the EXCHANGED coordinates are in this unit —
    // proj_4D_api/pj_fwd multiply the final metre result by 1/to_meter)
    val unitToMeter: Double = kv.get("to_meter").map(_.toDouble).orElse(
      kv.get("units").map {
        case "m" | "meter" | "metre" => 1.0
        case "ft" => 0.3048
        case "us-ft" => 1200.0 / 3937.0
        case "km" => 1000.0
        case u => throw new IllegalArgumentException(
          s"unsupported +units=$u (supported: m, ft, us-ft, km, or an " +
            "explicit +to_meter=)")
      }).getOrElse(1.0)
    require(unitToMeter > 0, s"+to_meter must be positive, got $unitToMeter")

    val proj = kv.getOrElse("proj",
      throw new IllegalArgumentException("missing +proj="))
    val p: Projection = proj match {
      case "longlat" | "latlong" | "latlon" | "lonlat" => Geographic(ell)
      case "utm" =>
        val zone = numOpt("zone").getOrElse(
          throw new IllegalArgumentException("+proj=utm needs +zone=")).toInt
        require(zone >= 1 && zone <= 60, s"bad UTM zone $zone")
        val south = kv.contains("south")
        TMerc(ell, zone * 6 - 183, 0, 0.9996, 500000, if (south) 10000000 else 0)
      case "tmerc" =>
        TMerc(ell, num("lon_0", 0), num("lat_0", 0),
          numOpt("k").orElse(numOpt("k_0")).getOrElse(1.0),
          num("x_0", 0), num("y_0", 0))
      case "lcc" =>
        val lat1 = numOpt("lat_1").getOrElse(
          throw new IllegalArgumentException("+proj=lcc needs +lat_1="))
        val lat2 = num("lat_2", lat1)
        val k0 = numOpt("k").orElse(numOpt("k_0")).getOrElse(1.0)
        require(k0 == 1.0,
          "lcc with a scale factor (1SP variant with k0≠1) is unsupported")
        Lcc2SP(ell, lat1, lat2, num("lat_0", 0), num("lon_0", 0),
          num("x_0", 0), num("y_0", 0))
      case "stere" =>
        val lat0 = num("lat_0", 90)
        require(math.abs(lat0) >= 90 - 1e-9,
          s"+proj=stere: only the polar aspect is supported (lat_0=$lat0)")
        val south = lat0 < 0
        val latTs = numOpt("lat_ts").getOrElse(lat0)
        PolarStereo(ell, latTs, num("lon_0", 0),
          numOpt("k").orElse(numOpt("k_0")).getOrElse(1.0),
          num("x_0", 0), num("y_0", 0), south)
      case "laea" =>
        Laea(ell, num("lat_0", 0), num("lon_0", 0), num("x_0", 0), num("y_0", 0))
      case "aea" =>
        Aea(ell, num("lat_1", 29.5), num("lat_2", 45.5),
          num("lat_0", 0), num("lon_0", 0), num("x_0", 0), num("y_0", 0))
      case other => throw new IllegalArgumentException(
        s"+proj=$other unsupported (supported: longlat utm tmerc lcc stere laea aea)")
    }
    // geographic coordinates are degrees; PROJ ignores +units there too
    val u = if (p.isInstanceOf[Geographic]) 1.0 else unitToMeter
    Crs(0, p, toWgs84, u)
  }

  // --------------------------------------------------------------- WKT1

  /** WKT node: NAME[arg, arg, …] where arg = quoted string | number | node. */
  private final case class WNode(name: String, args: Vector[Any]) {
    def children(n: String): Vector[WNode] =
      args.collect { case c: WNode if c.name.equalsIgnoreCase(n) => c }
    def child(n: String): Option[WNode] = children(n).headOption
    def str(i: Int): String = args(i).asInstanceOf[String]
    def dbl(i: Int): Double = args(i) match {
      case d: Double => d
      case s: String => s.toDouble
      case o => throw new IllegalArgumentException(s"expected number, got $o")
    }
  }

  private def parseWktNode(s: String, pos0: Int): (WNode, Int) = {
    var pos = pos0
    def skipWs(): Unit = while (pos < s.length && (s(pos).isWhitespace || s(pos) == ',')) pos += 1
    skipWs()
    val nameStart = pos
    while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
    val name = s.substring(nameStart, pos)
    skipWs()
    require(pos < s.length && s(pos) == '[', s"expected [ after $name at $pos")
    pos += 1
    val args = Vector.newBuilder[Any]
    var done = false
    while (!done) {
      skipWs()
      if (pos >= s.length) throw new IllegalArgumentException("unterminated WKT")
      s(pos) match {
        case ']' => pos += 1; done = true
        case '"' =>
          val end = s.indexOf('"', pos + 1)
          require(end > 0, "unterminated string in WKT")
          args += s.substring(pos + 1, end)
          pos = end + 1
        case c if c.isLetter =>
          // identifier: a child node if followed by '[' (WKT1 and WKT2
          // both), else a bare enum keyword (WKT2 AXIS directions like
          // `east`, `north`)
          val idStart = pos
          var e = pos
          while (e < s.length && (s(e).isLetterOrDigit || s(e) == '_')) e += 1
          var ws = e
          while (ws < s.length && s(ws).isWhitespace) ws += 1
          if (ws < s.length && s(ws) == '[') {
            val (child, np) = parseWktNode(s, pos)
            args += child
            pos = np
          } else {
            args += s.substring(idStart, e)
            pos = e
          }
        case _ =>
          val numEnd = {
            var e = pos
            while (e < s.length && "+-.eE0123456789".indexOf(s(e)) >= 0) e += 1
            e
          }
          args += s.substring(pos, numEnd).toDouble
          pos = numEnd
      }
    }
    (WNode(name, args.result()), pos)
  }

  def fromWkt(s: String): Crs = {
    val (root, _) = parseWktNode(s.trim, 0)
    root.name.toUpperCase match {
      case "GEOGCS" =>
        val (ell, toWgs) = geogcsDatum(root)
        Crs(authorityOf(root), Geographic(ell), toWgs)
      case "PROJCS" => projcs(root)
      // WKT2 (ISO 19162) roots — `ogr_srs_api` importFromWkt accepts both
      // generations; so do we
      case "GEOGCRS" | "GEODCRS" =>
        Crs(idOf(root), Geographic(ellipsoid2(root)), None)
      case "PROJCRS" => projcrs2(root, None)
      case "BOUNDCRS" => boundcrs2(root)
      case other => throw new IllegalArgumentException(s"unsupported WKT root $other")
    }
  }

  private def authorityOf(n: WNode): Int =
    n.child("AUTHORITY").filter(_.args.length >= 2)
      .flatMap(a => scala.util.Try(a.str(1).toInt).toOption).getOrElse(0)

  private def geogcsDatum(geogcs: WNode): (Ellipsoid, Option[Helmert]) = {
    // Mirror the WKT2 path's validation: a non-Greenwich PRIMEM or a
    // non-degree angular UNIT silently ignored would shift every
    // coordinate (Paris meridian = 2.337°), so both fail loudly.
    geogcs.child("PRIMEM").foreach(pm =>
      require(pm.dbl(1) == 0.0,
        s"only Greenwich prime meridian supported (got PRIMEM ${pm.str(0)})"))
    geogcs.child("UNIT").foreach(u =>
      require(math.abs(u.dbl(1) - math.Pi / 180) < 1e-12,
        s"only degree angular units supported in GEOGCS (got ${u.str(0)})"))
    val datum = geogcs.child("DATUM").getOrElse(
      throw new IllegalArgumentException("GEOGCS without DATUM"))
    val sph = datum.child("SPHEROID").orElse(datum.child("ELLIPSOID")).getOrElse(
      throw new IllegalArgumentException("DATUM without SPHEROID"))
    val ell = Ellipsoid(sph.dbl(1), sph.dbl(2))
    val toWgs = datum.child("TOWGS84") match {
      case Some(t) =>
        val p = t.args.collect { case d: Double => d }
        val full = p.padTo(7, 0.0)
        if (full.forall(_ == 0.0)) None
        else Some(Helmert(full(0), full(1), full(2), full(3), full(4), full(5), full(6)))
      case None =>
        val dn = datum.str(0).toUpperCase
        if (dn.contains("OSGB")) Some(Osgb36ToWgs84) else None
    }
    (ell, toWgs)
  }

  private def projcs(projcs: WNode): Crs = {
    val geogcs = projcs.child("GEOGCS").getOrElse(
      throw new IllegalArgumentException("PROJCS without GEOGCS"))
    val (ell, toWgs) = geogcsDatum(geogcs)
    val projName = projcs.child("PROJECTION").map(_.str(0)).getOrElse(
      throw new IllegalArgumentException("PROJCS without PROJECTION"))
    val params: Map[String, Double] = projcs.children("PARAMETER")
      .map(p => p.str(0).toLowerCase -> p.dbl(1)).toMap
    def pr(k: String, default: Double): Double = params.getOrElse(k, default)
    def prAny(ks: Seq[String], default: Double): Double =
      ks.collectFirst { case k if params.contains(k) => params(k) }.getOrElse(default)
    // WKT1 linear parameters (false easting/northing) are expressed in the
    // PROJCS UNIT (e.g. US survey feet for state plane) — convert them to
    // the metre-based kernels; the CRS exchanges coordinates in that unit
    val unitToMeter = projcs.child("UNIT").map(_.dbl(1)).getOrElse(1.0)
    require(unitToMeter > 0,
      s"PROJCS UNIT factor must be positive, got $unitToMeter")
    val fe = pr("false_easting", 0) * unitToMeter
    val fn = pr("false_northing", 0) * unitToMeter
    val p: Projection = projName.toLowerCase match {
      case "transverse_mercator" =>
        TMerc(ell, pr("central_meridian", 0), pr("latitude_of_origin", 0),
          pr("scale_factor", 1.0), fe, fn)
      case "lambert_conformal_conic_2sp" | "lambert_conformal_conic" =>
        // mirror the PROJ.4 path's guard: an ESRI 1SP-style LCC with
        // Scale_Factor != 1 silently projected with k=1 would be off by
        // hundreds of metres
        require(pr("scale_factor", 1.0) == 1.0,
          "Lambert_Conformal_Conic with scale_factor != 1 (1SP variant) is unsupported")
        val lat1 = prAny(Seq("standard_parallel_1"), pr("latitude_of_origin", 0))
        Lcc2SP(ell, lat1, pr("standard_parallel_2", lat1),
          prAny(Seq("latitude_of_origin", "latitude_of_center"), 0),
          prAny(Seq("central_meridian", "longitude_of_center"), 0), fe, fn)
      case "polar_stereographic" =>
        val lat0 = prAny(Seq("latitude_of_origin", "standard_parallel_1"), 90)
        PolarStereo(ell, lat0, prAny(Seq("central_meridian", "longitude_of_origin"), 0),
          pr("scale_factor", 1.0), fe, fn, south = lat0 < 0)
      case "lambert_azimuthal_equal_area" =>
        Laea(ell, prAny(Seq("latitude_of_center", "latitude_of_origin"), 0),
          prAny(Seq("longitude_of_center", "central_meridian"), 0), fe, fn)
      case "albers_conic_equal_area" =>
        Aea(ell, pr("standard_parallel_1", 29.5), pr("standard_parallel_2", 45.5),
          prAny(Seq("latitude_of_center", "latitude_of_origin"), 0),
          prAny(Seq("longitude_of_center", "central_meridian"), 0), fe, fn)
      case other => throw new IllegalArgumentException(
        s"""unsupported PROJECTION["$other"]""")
    }
    Crs(authorityOf(projcs), p, toWgs, unitToMeter)
  }

  // --------------------------------------------------------------- WKT2
  // ISO 19162 / "WKT2-2019" — PROJCRS/GEOGCRS/BOUNDCRS roots with
  // CONVERSION[METHOD[…], PARAMETER[…]] and EPSG long parameter names.
  // The reference accepts both WKT generations through the same
  // importFromWkt entry point (`ogr/ogrspatialreference.cpp`).

  /** WKT2 ID["EPSG", n] (replaces WKT1 AUTHORITY). */
  private def idOf(n: WNode): Int =
    n.children("ID").collectFirst {
      case id if id.args.length >= 2 && id.str(0).equalsIgnoreCase("EPSG") =>
        id.args(1) match {
          case d: Double => d.toInt
          case s2: String => s2.toInt
          case o => throw new IllegalArgumentException(s"bad ID code $o")
        }
    }.getOrElse(0)

  /** Parameter value in kernel units (degrees / metres): converts via the
    * inline ANGLEUNIT factor (degree recognised exactly so values stay
    * bit-identical with the PROJ.4 path), requires metre lengths and
    * unity scales.
    */
  /** ISO 19162 allows the bare `UNIT` keyword as a compat alias for the
    * typed ANGLEUNIT/LENGTHUNIT; classify an aliased unit by its name
    * (angular names are a closed set), since the factor alone is ambiguous
    * (radian = 1.0 = metre).
    */
  private def isAngularUnitName(n: String): Boolean = {
    val l = n.toLowerCase
    l.contains("degree") || l.contains("grad") || l.contains("radian") ||
      l.contains("arc")
  }

  private def paramVal2(p: WNode): Double = {
    val v = p.dbl(1)
    p.child("ANGLEUNIT")
      .orElse(p.child("UNIT").filter(u => isAngularUnitName(u.str(0)))) match {
      case Some(u) =>
        val f = u.dbl(1)
        if (math.abs(f - math.Pi / 180) < 1e-12) v // degrees: exact
        else v * f * 180.0 / math.Pi // radian/grad/arc-second etc.
      case None =>
        p.child("SCALEUNIT").foreach(u =>
          require(math.abs(u.dbl(1) - 1.0) < 1e-9,
            s"only unity scale parameters supported (got ${u.str(0)})"))
        // length parameters convert to metres via their inline unit
        v * p.child("LENGTHUNIT").orElse(p.child("UNIT")).map(_.dbl(1))
          .getOrElse(1.0)
    }
  }

  /** Ellipsoid of a WKT2 geographic node (DATUM / TRF / datum ENSEMBLE). */
  private def ellipsoid2(geog: WNode): Ellipsoid = {
    val datum = geog.child("DATUM").orElse(geog.child("TRF"))
      .orElse(geog.child("ENSEMBLE")).getOrElse(
        throw new IllegalArgumentException(s"${geog.name} without DATUM/ENSEMBLE"))
    val e = datum.child("ELLIPSOID").orElse(datum.child("SPHEROID")).getOrElse(
      throw new IllegalArgumentException("datum without ELLIPSOID"))
    e.child("LENGTHUNIT").foreach(u =>
      require(math.abs(u.dbl(1) - 1.0) < 1e-9, "only metre ellipsoid axes supported"))
    geog.child("PRIMEM").foreach(pm =>
      require(pm.dbl(1) == 0.0, "only Greenwich prime meridian supported"))
    Ellipsoid(e.dbl(1), e.dbl(2))
  }

  private def projcrs2(root: WNode, toWgs: Option[Helmert]): Crs = {
    val base = root.child("BASEGEOGCRS").orElse(root.child("BASEGEODCRS")).getOrElse(
      throw new IllegalArgumentException("PROJCRS without BASEGEOGCRS"))
    val ell = ellipsoid2(base)
    val conv = root.child("CONVERSION").getOrElse(
      throw new IllegalArgumentException("PROJCRS without CONVERSION"))
    val method = conv.child("METHOD").getOrElse(
      throw new IllegalArgumentException("CONVERSION without METHOD"))
    val methodCode = idOf(method)
    val params: Map[String, Double] = conv.children("PARAMETER")
      .map(p => p.str(0).toLowerCase -> paramVal2(p)).toMap
    def pr(k: String, default: Double): Double = params.getOrElse(k, default)
    val p: Projection = (method.str(0).toLowerCase, methodCode) match {
      case (m, c) if c == 9807 || m == "transverse mercator" =>
        TMerc(ell, pr("longitude of natural origin", 0),
          pr("latitude of natural origin", 0),
          pr("scale factor at natural origin", 1.0),
          pr("false easting", 0), pr("false northing", 0))
      case (m, c) if c == 9802 || m.startsWith("lambert conic conformal (2sp") =>
        Lcc2SP(ell, pr("latitude of 1st standard parallel", 0),
          pr("latitude of 2nd standard parallel",
            pr("latitude of 1st standard parallel", 0)),
          pr("latitude of false origin", 0), pr("longitude of false origin", 0),
          pr("easting at false origin", 0), pr("northing at false origin", 0))
      case (m, c) if c == 9801 || m.startsWith("lambert conic conformal (1sp") =>
        val k0 = pr("scale factor at natural origin", 1.0)
        require(k0 == 1.0, "Lambert Conic Conformal (1SP) with k0≠1 unsupported")
        val lat0 = pr("latitude of natural origin", 0)
        Lcc2SP(ell, lat0, lat0, lat0, pr("longitude of natural origin", 0),
          pr("false easting", 0), pr("false northing", 0))
      case (m, c) if c == 9810 || m.startsWith("polar stereographic (variant a") =>
        val lat0 = pr("latitude of natural origin", 90)
        require(math.abs(lat0) >= 90 - 1e-9,
          s"polar stereographic variant A needs lat_0=±90 (got $lat0)")
        PolarStereo(ell, lat0, pr("longitude of natural origin", 0),
          pr("scale factor at natural origin", 1.0),
          pr("false easting", 0), pr("false northing", 0), south = lat0 < 0)
      case (m, c) if c == 9829 || m.startsWith("polar stereographic (variant b") =>
        val latTs = pr("latitude of standard parallel", 90)
        PolarStereo(ell, latTs, pr("longitude of origin", 0), 1.0,
          pr("false easting", 0), pr("false northing", 0), south = latTs < 0)
      case (m, c) if c == 9820 || m == "lambert azimuthal equal area" =>
        Laea(ell, pr("latitude of natural origin", 0),
          pr("longitude of natural origin", 0),
          pr("false easting", 0), pr("false northing", 0))
      case (m, c) if c == 9822 || m == "albers equal area" =>
        Aea(ell, pr("latitude of 1st standard parallel", 29.5),
          pr("latitude of 2nd standard parallel", 45.5),
          pr("latitude of false origin", 0), pr("longitude of false origin", 0),
          pr("easting at false origin", 0), pr("northing at false origin", 0))
      case (other, code) => throw new IllegalArgumentException(
        s"""unsupported WKT2 METHOD["$other"] (EPSG $code)""")
    }
    // coordinate-system unit: a LENGTHUNIT directly under the root (shared
    // form) or under each AXIS (per-axis form); must agree when repeated
    val csUnit: Double = {
      def lenUnits(n: WNode): Vector[Double] =
        (n.children("LENGTHUNIT") ++
          n.children("UNIT").filterNot(u => isAngularUnitName(u.str(0))))
          .map(_.dbl(1))
      val us = (lenUnits(root) ++ root.children("AXIS").flatMap(lenUnits)).distinct
      require(us.size <= 1, s"inconsistent axis LENGTHUNIT factors: $us")
      val u = us.headOption.getOrElse(1.0)
      require(u > 0, s"LENGTHUNIT factor must be positive, got $u")
      u
    }
    Crs(idOf(root), p, toWgs, csUnit)
  }

  /** WKT2 BOUNDCRS: SOURCECRS + ABRIDGEDTRANSFORMATION (the WKT2 spelling
    * of WKT1's TOWGS84 — translations in metres, rotations in arc-seconds,
    * scale difference in ppm, same as `+towgs84`).
    */
  private def boundcrs2(root: WNode): Crs = {
    val srcNode = root.child("SOURCECRS").flatMap(_.args.collectFirst {
      case c: WNode => c
    }).getOrElse(throw new IllegalArgumentException("BOUNDCRS without SOURCECRS"))
    val h = root.child("ABRIDGEDTRANSFORMATION").map { tr =>
      val p: Map[String, Double] = tr.children("PARAMETER")
        .map(q => q.str(0).toLowerCase -> q.dbl(1)).toMap
      def g(k: String): Double = p.getOrElse(k, 0.0)
      // abridged transformations write the scale difference as the ratio
      // (1 + dS·1e-6); plain ppm values are tiny, ratios are ≈1
      val dsRaw = g("scale difference")
      val ds = if (math.abs(dsRaw) > 0.9) (dsRaw - 1.0) * 1e6 else dsRaw
      Helmert(g("x-axis translation"), g("y-axis translation"),
        g("z-axis translation"), g("x-axis rotation"), g("y-axis rotation"),
        g("z-axis rotation"), ds)
    }.filter(hh => !(hh.tx == 0 && hh.ty == 0 && hh.tz == 0 && hh.rx == 0 &&
      hh.ry == 0 && hh.rz == 0 && hh.ds == 0))
    srcNode.name.toUpperCase match {
      case "PROJCRS" => projcrs2(srcNode, h)
      case "GEOGCRS" | "GEODCRS" =>
        Crs(idOf(srcNode), Geographic(ellipsoid2(srcNode)), h)
      case other => throw new IllegalArgumentException(
        s"unsupported BOUNDCRS source $other")
    }
  }
}
