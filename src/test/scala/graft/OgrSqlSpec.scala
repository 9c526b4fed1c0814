package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.PolyFixture

/** Port of the reference OGR SQL corpus
  * (`/root/reference/autotest/ogr/ogr_sql_test.py`) over the poly/idlink
  * fixtures, run through Spark SQL + the registered st_* functions.
  * Expected values are the reference's own.
  */
class OgrSqlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.spark
    // poly gets a FID column mirroring shapefile feature ids (0-based order)
    import s.implicits._
    PolyFixture.polyDF(s)
      .withColumn("fid", monotonically_increasing_id())
      .withColumn("geom", gf.st_geomfromtext($"wkt"))
      .createOrReplaceTempView("poly")
    PolyFixture.idlinkDF(s).createOrReplaceTempView("idlink")
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      PolyFixture.polyDF(s).schema).createOrReplaceTempView("empty")
    s
  }

  test("ogr_sql_1: where clause count (eas_id < 167 -> 3; all -> 10)") {
    assert(spark.sql("select * from poly where eas_id < 167").count() === 3)
    assert(spark.table("poly").count() === 10)
  }

  test("ogr_sql_2: DISTINCT (5 values under 170)") {
    val got = spark.sql("select distinct eas_id from poly where eas_id < 170")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(168L, 169L, 166L, 158L, 165L))
  }

  test("ogr_sql_3: DISTINCT + ORDER BY asc/desc") {
    val asc = spark.sql(
      "select distinct eas_id from poly where eas_id < 170 order by eas_id")
      .collect().map(_.getLong(0)).toSeq
    assert(asc === Seq(158L, 165L, 166L, 168L, 169L))
    val desc = spark.sql(
      "select distinct eas_id from poly where eas_id < 170 order by eas_id desc")
      .collect().map(_.getLong(0)).toSeq
    assert(desc === Seq(169L, 168L, 166L, 165L, 158L))
  }

  test("ogr_sql_4: DISTINCT + ORDER BY on strings") {
    val got = spark.sql("select distinct name from idlink order by name asc")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_"))
  }

  test("ogr_sql_5: summary aggregates on idlink") {
    val r = spark.sql(
      """select max(eas_id) mx, min(eas_id) mn, avg(eas_id) av,
        |sum(eas_id) sm, count(eas_id) ct from idlink""".stripMargin).head()
    assert(r.getLong(0) === 179L)
    assert(r.getLong(1) === 158L)
    assert(math.abs(r.getDouble(2) - 168.142857142857) < 1e-12)
    assert(r.getLong(3) === 1177L)
    assert(r.getLong(4) === 7L)
  }

  test("ogr_sql_6: COUNT(*)") {
    assert(spark.sql("select count(*) from poly").head().getLong(0) === 10L)
  }

  test("ogr_sql_7: FID selection (eas_id in (158,165) -> fids 7,8)") {
    val got = spark.sql(
      "select eas_id, fid from poly where eas_id in (158,165) order by fid")
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(7L, 8L))
  }

  test("ogr_sql_8: wildcard expansion") {
    val got = spark.sql("select * from poly where eas_id in (158,165) order by fid")
      .collect().map(_.getAs[String]("prfedea")).toSeq
    assert(got === Seq("35043369", "35043408"))
  }

  test("ogr_sql_10: ILIKE") {
    val got = spark.sql("select eas_id from poly where prfedea ilike '%413'")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(170L))
  }

  test("ogr_sql_11/12: aggregates and DISTINCT on empty table") {
    val mx = spark.sql("select max(eas_id) from empty").head()
    assert(mx.isNullAt(0))
    assert(spark.sql("select distinct eas_id from empty").count() === 0)
  }

  test("ogr_sql_13: OGR_GEOMETRY special field -> st_geometrytype") {
    val got = spark.sql(
      "select st_geometrytype(geom) g from poly where st_geometrytype(geom) = 'POLYGON'")
      .collect().map(_.getString(0))
    assert(got.length === 10 && got.forall(_ === "POLYGON"))
  }

  test("special fields: OGR_GEOM_WKT + OGR_GEOM_AREA analogues") {
    // ogr_sql.dox special fields: st_astext / st_area play those roles
    val n = spark.sql(
      "select st_astext(geom) from poly where st_astext(geom) like 'POLYGON%'").count()
    assert(n === 10)
    // area of eas_id=170 polygon ~ 5268.813 (poly.dbf AREA column)
    val a = spark.sql("select st_area(geom) from poly where eas_id = 170").head().getDouble(0)
    assert(math.abs(a - 5268.813) < 0.5)
  }

  test("ogr_rfc28_14: SUBSTR with start+length (rfc28:306)") {
    val got = spark.sql(
      "select substr(prfedea, 4, 5) s from poly where eas_id in (168, 179) order by fid")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("43411", "43423"))
  }

  test("ogr_rfc28_15: CONCAT with CAST CHARACTER (rfc28:322)") {
    val got = spark.sql(
      """select concat(prfedea, ' ', cast(eas_id as string)) c
        |from poly where eas_id in (168, 179) order by fid""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("35043411 168", "35043423 179"))
  }

  test("ogr_rfc28_26: SUBSTR with negative offset (rfc28:581)") {
    import org.apache.spark.sql.functions._
    val got = spark.table("poly")
      .filter(col("eas_id").isin(168, 179))
      .orderBy(col("fid"))
      .select(gf.ogr_substr(col("prfedea"), lit(-2), None))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("11", "23"))
  }

  test("st_area matches the reference AREA attribute for all 10 polygons") {
    import spark.implicits._
    val rows = spark.sql("select area, st_area(geom) a from poly")
      .as[(Double, Double)].collect()
    rows.foreach { case (expected, got) =>
      assert(math.abs(expected - got) < 0.5, s"area mismatch: $expected vs $got")
    }
  }
}
