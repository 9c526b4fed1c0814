package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Arrangement, Geom, GeomOps, GMulti, GPolygon}

/** st_makevalid — repair of invalid areal geometry over the arrangement,
  * LINEWORK (even-odd) and STRUCTURE (nonzero winding) methods per the
  * GEOS MakeValid contract.
  */
class MakeValidSpec extends AnyFunSuite {

  private def mv(wkt: String, structure: Boolean = false): Option[Geom] =
    Arrangement.makeValid(Geom.fromWkt(wkt), structure)

  private def area(g: Geom): Double = GeomOps.area(g)

  test("bowtie splits into two triangles, area preserved") {
    val out = mv("POLYGON((0 0,2 2,2 0,0 2,0 0))").get
    out match {
      case m: GMulti => assert(m.geoms.length == 2)
      case other => fail(s"expected multipolygon, got $other")
    }
    assert(math.abs(area(out) - 2.0) < 1e-6)
    // structure method: same result for a bowtie (lobes wind +1/-1)
    val st = mv("POLYGON((0 0,2 2,2 0,0 2,0 0))", structure = true).get
    assert(math.abs(area(st) - 2.0) < 1e-6)
  }

  test("wrongly oriented hole is still a hole (both methods)") {
    // both rings CCW — invalid orientation, hole must survive repair
    val wkt = "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))"
    for (structure <- Seq(false, true)) {
      val out = mv(wkt, structure).get
      assert(math.abs(area(out) - 64.0) < 1e-5, s"structure=$structure")
      val p = out.asInstanceOf[GPolygon]
      assert(p.rings.length == 2)
    }
  }

  test("hole sticking out of the shell becomes its own face") {
    // shell 4x4, "hole" 2x2 half outside the shell
    val wkt = "POLYGON((0 0,4 0,4 4,0 4,0 0),(3 1,5 1,5 3,3 3,3 1))"
    val out = mv(wkt).get
    // even-odd: inside-shell part of the hole (1x2) is a hole, the
    // outside part (1x2) is covered once -> kept as a face
    assert(math.abs(area(out) - (16.0 - 2.0 + 2.0)) < 1e-5)
    out match {
      case m: GMulti => assert(m.geoms.length == 2)
      case other => fail(s"expected 2 faces, got $other")
    }
  }

  test("overlapping multipolygon members: linework vs structure") {
    val wkt = "MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((1 0,3 0,3 2,1 2,1 0)))"
    val lw = mv(wkt).get
    // even-odd: the 1x2 overlap is covered twice -> dropped
    assert(math.abs(area(lw) - 4.0) < 1e-5)
    val st = mv(wkt, structure = true).get
    // nonzero winding: members union
    assert(math.abs(area(st) - 6.0) < 1e-5)
    assert(st.isInstanceOf[GPolygon])
  }

  test("valid polygon passes through with area and hole intact") {
    val wkt = "POLYGON((0 0,8 0,8 8,0 8,0 0),(3 3,3 5,5 5,5 3,3 3))"
    val out = mv(wkt).get
    assert(math.abs(area(out) - 60.0) < 1e-5)
    assert(out.asInstanceOf[GPolygon].rings.length == 2)
  }

  test("degenerate ring yields no face; non-areal passes through") {
    assert(mv("POLYGON((0 0,1 0,0 0))").isEmpty)
    val line = "LINESTRING (0 0,1 1)"
    assert(Geom.toWkt(mv(line).get) == line)
  }

  test("SQL surface: st_makevalid registered, both methods") {
    val spark = SparkTestBase.spark
    val row = spark.sql(
      "SELECT st_area(st_makevalid(st_geomfromtext(" +
        "'MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((1 0,3 0,3 2,1 2,1 0)))'))) AS lw, " +
        "st_area(st_makevalid(st_geomfromtext(" +
        "'MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((1 0,3 0,3 2,1 2,1 0)))'), " +
        "'STRUCTURE')) AS st").collect().head
    assert(math.abs(row.getDouble(0) - 4.0) < 1e-5)
    assert(math.abs(row.getDouble(1) - 6.0) < 1e-5)
  }
}
