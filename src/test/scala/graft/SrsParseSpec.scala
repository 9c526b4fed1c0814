package graft

import graft.core.{Proj, SrsParse}
import org.scalatest.funsuite.AnyFunSuite

/** SRS front-end (PROJ.4 string + WKT1 → Crs): equivalence with the EPSG
  * dispatch table, error behavior, and full-precision cross-validation of
  * the custom (non-EPSG-table) CRS set against the independent Python port
  * (tools/gen_proj_oracle.py --srs-tsv). Skips the cross-check if python3
  * is unavailable.
  */
class SrsParseSpec extends AnyFunSuite {

  private val srsDefs: Map[String, String] = Map(
    "gk3" -> ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 " +
      "+ellps=intl +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7"),
    "spcs" -> ("+proj=lcc +lat_1=34.0333 +lat_2=35.4666 +lat_0=33.5 " +
      "+lon_0=-118 +x_0=2000000 +y_0=500000 +ellps=GRS80"),
    "spcsft" -> ("+proj=lcc +lat_1=34.0333 +lat_2=35.4666 +lat_0=33.5 " +
      "+lon_0=-118 +x_0=2000000 +y_0=500000 +ellps=GRS80 +units=us-ft"),
    "spcswkt" -> ("""PROJCS["CA5ft",GEOGCS["NAD83",DATUM["NAD_1983",""" +
      """SPHEROID["GRS 1980",6378137,298.257222101]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Lambert_Conformal_Conic_2SP"],""" +
      """PARAMETER["standard_parallel_1",34.0333],""" +
      """PARAMETER["standard_parallel_2",35.4666],""" +
      """PARAMETER["latitude_of_origin",33.5],""" +
      """PARAMETER["central_meridian",-118],""" +
      """PARAMETER["false_easting",2000000],""" +
      """PARAMETER["false_northing",500000],""" +
      """UNIT["US survey foot",0.3048006096012192]]"""),
    "gls" -> "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +x_0=0 +y_0=0 +ellps=WGS84",
    "naa" -> "+proj=aea +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96 +x_0=0 +y_0=0 +ellps=clrk66",
    "nalaea" -> "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +ellps=WGS84",
    "bngwkt" -> ("""PROJCS["BNG",GEOGCS["OSGB36",DATUM["OSGB_1936",""" +
      """SPHEROID["Airy 1830",6377563.396,299.3249646],""" +
      """TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],""" +
      """PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],""" +
      """PARAMETER["scale_factor",0.9996012717],""" +
      """PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],""" +
      """UNIT["metre",1]]"""))

  private val wgs84 = Proj.byEpsg(4326).get

  test("proj4 UTM string matches the EPSG table dispatch") {
    val fromStr = SrsParse.parse("+proj=utm +zone=31 +ellps=WGS84 +units=m")
    val fromTable = Proj.byEpsg(32631).get
    for ((lon, lat) <- Seq((2.3522, 48.8566), (5.37, 43.30), (0.1278, 51.5074))) {
      val (x1, y1) = Proj.transformPoint(wgs84, fromStr, lon, lat)
      val (x2, y2) = Proj.transformPoint(wgs84, fromTable, lon, lat)
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
    }
    // south zone
    val s = SrsParse.parse("+proj=utm +zone=33 +south +ellps=WGS84")
    val (xs, ys) = Proj.transformPoint(wgs84, s, 13.23, -8.83)
    val (xt, yt) = Proj.transformPoint(wgs84, Proj.byEpsg(32733).get, 13.23, -8.83)
    assert(math.abs(xs - xt) < 1e-9 && math.abs(ys - yt) < 1e-9)
  }

  test("WKT BNG definition matches EPSG:27700 to sub-mm") {
    val w = SrsParse.parse(srsDefs("bngwkt"))
    val t = Proj.byEpsg(27700).get
    for ((lon, lat) <- Seq((-0.1276, 51.5072), (-3.1883, 55.9533))) {
      val (x1, y1) = Proj.transformPoint(wgs84, w, lon, lat)
      val (x2, y2) = Proj.transformPoint(wgs84, t, lon, lat)
      assert(math.abs(x1 - x2) < 1e-4 && math.abs(y1 - y2) < 1e-4)
    }
  }

  test("EPSG:n string form and geographic longlat") {
    assert(SrsParse.parse("EPSG:32631").proj == Proj.byEpsg(32631).get.proj)
    val ll = SrsParse.parse("+proj=longlat +ellps=WGS84")
    val (x, y) = Proj.transformPoint(ll, SrsParse.parse("EPSG:32631"), 3.0, 0.0)
    assert(math.abs(x - 500000.0) < 1e-6 && math.abs(y) < 1e-6)
  }

  test("two distinct parsed CRSes never hit the same-epsg shortcut") {
    val a = SrsParse.parse(srsDefs("gk3"))
    val b = SrsParse.parse(srsDefs("spcs"))
    assert(a.epsg == 0 && b.epsg == 0)
    val (x, y) = Proj.transformPoint(wgs84, a, 9.0, 48.0)
    val (x2, y2) = Proj.transformPoint(a, b, x, y) // must actually transform
    assert(math.abs(x2 - x) > 1000 || math.abs(y2 - y) > 1000)
  }

  test("unsupported definitions fail loudly") {
    assertThrows[IllegalArgumentException](SrsParse.parse("+proj=omerc +lat_0=4"))
    assertThrows[IllegalArgumentException](SrsParse.parse("+proj=utm")) // no zone
    assertThrows[IllegalArgumentException](SrsParse.parse("+proj=tmerc +ellps=nosuch"))
    assertThrows[IllegalArgumentException](SrsParse.parse("EPSG:999999"))
    assertThrows[IllegalArgumentException](SrsParse.parse("not an srs"))
    assertThrows[IllegalArgumentException](
      SrsParse.parse("+proj=stere +lat_0=45")) // oblique stereo
  }

  test("custom SRS set agrees with independent Python port to <0.1 mm") {
    val py = try {
      val p = new ProcessBuilder("python3", "tools/gen_proj_oracle.py", "--srs-tsv")
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      if (p.waitFor() != 0) cancel("python3 oracle failed: " + out.take(3).mkString(" | "))
      out
    } catch { case _: java.io.IOException => cancel("python3 not available") }
    val points = Map(
      1 -> ("gk3", 9.18, 48.78), 2 -> ("gk3", 11.58, 48.14),
      3 -> ("spcs", -118.24, 34.05), 4 -> ("spcs", -119.70, 34.42),
      5 -> ("gls", -39.0, 72.0), 6 -> ("gls", -51.7, 64.18),
      7 -> ("naa", -96.0, 40.0), 8 -> ("naa", -75.16, 39.95),
      9 -> ("nalaea", -100.0, 45.0), 10 -> ("nalaea", -122.33, 47.61),
      11 -> ("bngwkt", -0.1276, 51.5072), 12 -> ("bngwkt", -3.1883, 55.9533),
      13 -> ("spcsft", -118.24, 34.05), 14 -> ("spcsft", -119.70, 34.42),
      15 -> ("spcswkt", -118.24, 34.05), 16 -> ("spcswkt", -119.70, 34.42))
    var checked = 0
    py.foreach { line =>
      val f = line.split("\t")
      val pid = f(0).toInt
      val (tag, lon, lat) = points(pid)
      assert(tag == f(1))
      val crs = SrsParse.parse(srsDefs(tag))
      val (x, y) = Proj.transformPoint(wgs84, crs, lon, lat)
      assert(math.abs(x - f(2).toDouble) < 1e-4,
        s"pid $pid ($tag) x: $x vs ${f(2)}")
      assert(math.abs(y - f(3).toDouble) < 1e-4,
        s"pid $pid ($tag) y: $y vs ${f(3)}")
      checked += 1
    }
    assert(checked == 16)
  }

  test("linear units: us-ft, to_meter, WKT1 foot UNIT, round-trips") {
    val usft = 1200.0 / 3937.0
    val m = SrsParse.parse(srsDefs("spcs"))
    val ft = SrsParse.parse(srsDefs("spcsft"))
    // +units=us-ft leaves +x_0/+y_0 in metres: feet output = metre
    // output / usft exactly (PROJ fr_meter semantics)
    val (xm, ym) = Proj.transformPoint(wgs84, m, -118.24, 34.05)
    val (xf, yf) = Proj.transformPoint(wgs84, ft, -118.24, 34.05)
    assert(math.abs(xf * usft - xm) < 1e-6 && math.abs(yf * usft - ym) < 1e-6)
    // round-trip through the feet CRS recovers the geographic input
    val (lon, lat) = Proj.transformPoint(ft, wgs84, xf, yf)
    assert(math.abs(lon - -118.24) < 1e-9 && math.abs(lat - 34.05) < 1e-9)
    // WKT1 foot UNIT: false easting/northing are in feet, so the same
    // point lands at a different (unit-consistent) coordinate
    val w = SrsParse.parse(srsDefs("spcswkt"))
    val (xw, yw) = Proj.transformPoint(wgs84, w, -118.24, 34.05)
    // metre-space: (xm - 2000000 m) + 2000000 ft·usft, exchanged in feet
    val expX = ((xm - 2000000.0) + 2000000.0 * usft) / usft
    val expY = ((ym - 500000.0) + 500000.0 * usft) / usft
    assert(math.abs(xw - expX) < 1e-6 && math.abs(yw - expY) < 1e-6)
    // explicit +to_meter
    val km = SrsParse.parse(srsDefs("spcs") + " +to_meter=1000")
    val (xk, _) = Proj.transformPoint(wgs84, km, -118.24, 34.05)
    assert(math.abs(xk * 1000.0 - xm) < 1e-6)
    // geographic CRSes never carry a unit; junk units still fail loudly
    assert(SrsParse.parse("+proj=longlat +ellps=WGS84 +units=us-ft").unitToMeter == 1.0)
    assertThrows[IllegalArgumentException](
      SrsParse.parse("+proj=utm +zone=31 +ellps=WGS84 +units=links"))
  }
  test("ESRI-flavor WKT1 parses (D_ datums, unsuffixed LCC alias)") {
    // morphFromESRI territory (reference: ogr/ogr_srs_esri.cpp): ESRI
    // spells the datum D_North_American_1983 and the projection
    // Lambert_Conformal_Conic without the _2SP suffix; both forms must
    // land on the same CRS as the OGC spelling
    val esri = """PROJCS["NAD_1983_StatePlane_California_V",""" +
      """GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",""" +
      """SPHEROID["GRS_1980",6378137.0,298.257222101]],""" +
      """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
      """PROJECTION["Lambert_Conformal_Conic"],""" +
      """PARAMETER["False_Easting",2000000.0],""" +
      """PARAMETER["False_Northing",500000.0],""" +
      """PARAMETER["Central_Meridian",-118.0],""" +
      """PARAMETER["Standard_Parallel_1",34.0333],""" +
      """PARAMETER["Standard_Parallel_2",35.4666],""" +
      """PARAMETER["Latitude_Of_Origin",33.5],UNIT["Meter",1.0]]"""
    val e = SrsParse.parse(esri)
    val o = SrsParse.parse(srsDefs("spcs"))
    val (x1, y1) = Proj.transformPoint(wgs84, e, -118.24, 34.05)
    val (x2, y2) = Proj.transformPoint(wgs84, o, -118.24, 34.05)
    assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
  }

  // ------------------------------------------------------------- WKT2

  test("WKT2 PROJCRS UTM with AXIS keywords matches the EPSG table") {
    val wkt2 = """PROJCRS["WGS 84 / UTM zone 31N",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
      CONVERSION["UTM zone 31N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",3,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],
        PARAMETER["False easting",500000,LENGTHUNIT["metre",1],ID["EPSG",8806]],
        PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]],
      CS[Cartesian,2],
        AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
        AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]],
      ID["EPSG",32631]]"""
    val c = SrsParse.parse(wkt2)
    assert(c.epsg == 32631)
    val t = Proj.byEpsg(32631).get
    for ((lon, lat) <- Seq((2.3522, 48.8566), (5.37, 43.30))) {
      val (x1, y1) = Proj.transformPoint(wgs84, c, lon, lat)
      val (x2, y2) = Proj.transformPoint(wgs84, t, lon, lat)
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
    }
  }

  test("WKT2 BOUNDCRS (abridged Helmert) matches the WKT1 TOWGS84 path") {
    val wkt2 = """BOUNDCRS[
      SOURCECRS[PROJCRS["BNG",
        BASEGEOGCRS["OSGB36",
          DATUM["OSGB 1936",
            ELLIPSOID["Airy 1830",6377563.396,299.3249646,LENGTHUNIT["metre",1]]]],
        CONVERSION["British National Grid",
          METHOD["Transverse Mercator",ID["EPSG",9807]],
          PARAMETER["Latitude of natural origin",49],
          PARAMETER["Longitude of natural origin",-2],
          PARAMETER["Scale factor at natural origin",0.9996012717],
          PARAMETER["False easting",400000],
          PARAMETER["False northing",-100000]],
        ID["EPSG",27700]]],
      TARGETCRS[GEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563]],ID["EPSG",4326]]],
      ABRIDGEDTRANSFORMATION["OSGB36 to WGS 84",
        METHOD["Position Vector transformation",ID["EPSG",9606]],
        PARAMETER["X-axis translation",446.448],
        PARAMETER["Y-axis translation",-125.157],
        PARAMETER["Z-axis translation",542.06],
        PARAMETER["X-axis rotation",0.1502],
        PARAMETER["Y-axis rotation",0.247],
        PARAMETER["Z-axis rotation",0.8421],
        PARAMETER["Scale difference",0.9999795106]]]"""
    val c2 = SrsParse.parse(wkt2)
    val c1 = SrsParse.parse(srsDefs("bngwkt"))
    for ((lon, lat) <- Seq((-0.1276, 51.5072), (-3.1883, 55.9533))) {
      val (x1, y1) = Proj.transformPoint(wgs84, c2, lon, lat)
      val (x2, y2) = Proj.transformPoint(wgs84, c1, lon, lat)
      assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6,
        s"($x1,$y1) vs ($x2,$y2)")
    }
  }

  test("WKT2 LCC 2SP by method code matches the proj4 definition") {
    val wkt2 = """PROJCRS["SPCS-ish",
      BASEGEOGCRS["NAD83",
        DATUM["North American Datum 1983",
          ELLIPSOID["GRS 1980",6378137,298.257222101]]],
      CONVERSION["LCC",
        METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],
        PARAMETER["Latitude of 1st standard parallel",34.0333],
        PARAMETER["Latitude of 2nd standard parallel",35.4666],
        PARAMETER["Latitude of false origin",33.5],
        PARAMETER["Longitude of false origin",-118],
        PARAMETER["Easting at false origin",2000000],
        PARAMETER["Northing at false origin",500000]]]"""
    val c2 = SrsParse.parse(wkt2)
    val c1 = SrsParse.parse(srsDefs("spcs"))
    for ((lon, lat) <- Seq((-118.24, 34.05), (-119.70, 34.42))) {
      val (x1, y1) = Proj.transformPoint(wgs84, c2, lon, lat)
      val (x2, y2) = Proj.transformPoint(wgs84, c1, lon, lat)
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
    }
  }

  test("WKT2 GEOGCRS root and polar stereographic variant B") {
    val g = SrsParse.parse("""GEOGCRS["WGS 84",
      ENSEMBLE["World Geodetic System 1984 ensemble",
        MEMBER["World Geodetic System 1984 (G2296)"],
        ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],
        ENSEMBLEACCURACY[2.0]],
      CS[ellipsoidal,2],
        AXIS["geodetic latitude (Lat)",north,ANGLEUNIT["degree",0.0174532925199433]],
        AXIS["geodetic longitude (Lon)",east,ANGLEUNIT["degree",0.0174532925199433]],
      ID["EPSG",4326]]""")
    assert(g.epsg == 4326 && g.proj.isInstanceOf[Proj.Geographic])
    val psB = SrsParse.parse("""PROJCRS["NSIDC-ish",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563]]],
      CONVERSION["Polar Stereographic",
        METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]],
        PARAMETER["Latitude of standard parallel",71],
        PARAMETER["Longitude of origin",-39]]]""")
    val p4 = SrsParse.parse(srsDefs("gls"))
    val (x1, y1) = Proj.transformPoint(wgs84, psB, -51.7, 64.18)
    val (x2, y2) = Proj.transformPoint(wgs84, p4, -51.7, 64.18)
    assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
  }
}
