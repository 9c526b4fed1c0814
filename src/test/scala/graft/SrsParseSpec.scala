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
      11 -> ("bngwkt", -0.1276, 51.5072), 12 -> ("bngwkt", -3.1883, 55.9533))
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
    assert(checked == 12)
  }
}
