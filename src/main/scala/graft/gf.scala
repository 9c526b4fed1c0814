package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import graft.expr._

/** Column-API facade for the engine's functions (the public surface a user
  * of the reference's OGR SQL dialect + geometry methods would reach for).
  */
object gf {
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def x(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftBridge.expression(c)

  // ---- geometry constructors / accessors ----
  def st_point(px: Column, py: Column): Column = col(StPoint(x(px.cast("double")), x(py.cast("double"))))
  def st_geomfromtext(wkt: Column): Column = col(StGeomFromText(x(wkt)))
  def st_astext(g: Column): Column = col(StAsText(x(g)))
  def st_x(g: Column): Column = col(StX(x(g)))
  def st_y(g: Column): Column = col(StY(x(g)))
  def st_geometrytype(g: Column): Column = col(StGeometryType(x(g)))
  def st_envelope(g: Column): Column = col(StEnvelope(x(g)))

  // ---- predicates ----
  def st_contains_point(poly: Column, px: Column, py: Column): Column =
    col(StContainsPoint(x(poly), x(px.cast("double")), x(py.cast("double"))))
  def st_intersects_point(g: Column, px: Column, py: Column): Column =
    col(StIntersectsPoint(x(g), x(px.cast("double")), x(py.cast("double"))))
  def st_intersects(a: Column, b: Column): Column = col(StIntersects(x(a), x(b)))
  def st_contains(a: Column, b: Column): Column = col(StContains(x(a), x(b)))
  def st_within(a: Column, b: Column): Column = col(StContains(x(b), x(a)))

  // ---- measures ----
  def st_area(g: Column): Column = col(StArea(x(g)))
  def st_length(g: Column): Column = col(StLength(x(g)))
  def st_distance(a: Column, b: Column): Column = col(StDistance(x(a), x(b)))
  def st_dwithin(a: Column, b: Column, d: Column): Column =
    col(StDWithin(x(a), x(b), x(d)))
  def st_distance_sphere(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    col(StDistanceSphere(x(lon1), x(lat1), x(lon2), x(lat2)))
  def cell_parent(c: Column): Column = col(CellParent(x(c)))
  def st_transform(g: Column, srcSrid: Int, dstSrid: Int): Column =
    col(StTransform(x(g), x(lit(srcSrid)), x(lit(dstSrid))))
  def st_transform(g: Column, srcSrid: Column, dstSrid: Column): Column =
    col(StTransform(x(g), x(srcSrid.cast("int")), x(dstSrid.cast("int"))))
  def st_transform_srs(g: Column, srcSrs: Column, dstSrs: Column): Column =
    col(StTransformSrs(x(g), x(srcSrs.cast("string")), x(dstSrs.cast("string"))))

  // ---- constructive ops ----
  def st_buffer(g: Column, dist: Column): Column = col(StBuffer(x(g), x(dist.cast("double"))))
  def st_boundary(g: Column): Column = col(StGeomMisc(x(g), 0))
  def st_delaunay(g: Column): Column = col(StGeomMisc(x(g), 1))
  def st_pointonsurface(g: Column): Column = col(StGeomMisc(x(g), 2))
  def st_intersection(a: Column, b: Column): Column = col(StOverlay(x(a), x(b), 0))
  def st_union(a: Column, b: Column): Column = col(StOverlay(x(a), x(b), 1))
  def st_difference(a: Column, b: Column): Column = col(StOverlay(x(a), x(b), 2))
  def st_symdifference(a: Column, b: Column): Column = col(StOverlay(x(a), x(b), 3))
  def st_force_polygon(g: Column): Column = col(StForce(x(g), toMulti = false))
  def st_force_multipolygon(g: Column): Column = col(StForce(x(g), toMulti = true))
  def st_convexhull(g: Column): Column = col(StConvexHull(x(g)))
  def st_simplify_preserve_topology(g: Column, tol: Column): Column =
    col(StSimplifyPT(x(g), x(tol.cast("double"))))
  def st_polygonize(g: Column): Column = col(StPolygonize(x(g)))
  def st_makevalid(g: Column): Column = col(StMakeValid(x(g), x(lit("LINEWORK"))))
  def st_makevalid(g: Column, method: Column): Column =
    col(StMakeValid(x(g), x(method.cast("string"))))
  def st_numpoints(g: Column): Column = col(StNumPoints(x(g)))
  def st_centroid(g: Column): Column = col(StCentroid(x(g)))
  def st_asgeojson(g: Column): Column = col(StAsGeoJson(x(g)))
  def st_geomfromgeojson(j: Column): Column = col(StGeomFromGeoJson(x(j)))
  def st_asgml(g: Column): Column = col(StAsGml(x(g)))
  def st_geomfromgml(j: Column): Column = col(StGeomFromGml(x(j)))
  def st_numgeometries(g: Column): Column = col(StNumGeometries(x(g)))
  def ogr_style_part_count(s: Column): Column = col(OgrStylePartCount(x(s)))
  def ogr_style_part(s: Column, i: Column): Column =
    col(OgrStyleBinary(x(s), x(i.cast("int")), 0))
  def ogr_style_tool(part: Column): Column = col(OgrStyleToolName(x(part)))
  def ogr_style_param(part: Column, key: Column): Column =
    col(OgrStyleBinary(x(part), x(key), 1))
  def ogr_style_param_unit(part: Column, key: Column): Column =
    col(OgrStyleBinary(x(part), x(key), 2))
  /** Aggregate: dissolve all geometries of a group into disjoint
    * polygons-with-holes (cascaded union).
    */
  def st_union_agg(g: Column): Column = graft.operators.Dissolve.st_union_agg(g)
  def st_curvetoline(wkt: Column, maxStepDeg: Column): Column =
    col(StCurveToLine(x(wkt), x(maxStepDeg.cast("double"))))
  def st_curve_contains_point(wkt: Column, px: Column, py: Column, stepDeg: Column): Column =
    col(StCurveContainsPoint(x(wkt), x(px.cast("double")), x(py.cast("double")),
      x(stepDeg.cast("double"))))
  def st_simplify(g: Column, tol: Column): Column = col(StSimplify(x(g), x(tol.cast("double"))))
  def st_segmentize(g: Column, maxLen: Column): Column = col(StSegmentize(x(g), x(maxLen.cast("double"))))

  // ---- cell index ----
  def cell_of(lon: Column, lat: Column, res: Int): Column =
    col(CellOf(x(lon.cast("double")), x(lat.cast("double")), x(lit(res))))
  def cells_covering(g: Column, res: Int): Column =
    col(CellsCovering(x(g), x(lit(res))))

  // ---- text→coords ----
  def geo_extract(text: Column): Column = col(GeoExtract(x(text)))

  // ---- text analysis / dedup primitives ----
  def minhash_sig(text: Column, shingle: Int, numHashes: Int): Column =
    col(MinHashSig(x(text), x(lit(shingle)), x(lit(numHashes))))
  def simhash64(text: Column): Column = col(SimHash64(x(text)))
  def doc_fingerprint(text: Column): Column = col(DocFingerprint(x(text)))
  def lang_id(text: Column): Column = col(LangId(x(text)))
  def ngram_jaccard(a: Column, b: Column, n: Int): Column =
    col(NgramJaccard(x(a), x(b), x(lit(n))))
  def hamming64(a: Column, b: Column): Column = col(Hamming64(x(a), x(b)))

  // ---- OGR SQL dialect semantics helpers ----

  /** OGR SUBSTR(s, start[, len]): 1-based, negative start counts from the
    * end (`/root/reference/gdal/ogr/ogr_sql.dox:141-144`).
    */
  def ogr_substr(s: Column, start: Column, len: Option[Column]): Column = {
    val begin = when(start < 0, greatest(length(s) + start + lit(1), lit(1))).otherwise(start)
    len match {
      case Some(l) => s.substr(begin, l)
      case None => s.substr(begin, length(s))
    }
  }

  /** OGR string equality is case-insensitive (`gdal/ogr/swq_op_general.cpp:572`
    * uses stricmp for EQ); wrap both sides.
    */
  def ogr_str_eq(a: Column, b: Column): Column = lower(a) === lower(b)

  /** hstore_get_value over "k=>v" pairs — exact parser port incl. quoting
    * and escapes (`gdal/ogr/swq_op_general.cpp:107-242`).
    */
  def hstore_get_value(h: Column, key: Column): Column =
    col(HStoreGetValue(x(h), x(key)))

  /** Register SQL names so spark.sql("st_contains(...)") works. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def r1(name: String, f: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      reg.createOrReplaceTempFunction(name, f, "internal")
    // SQL numeric literals arrive as Decimal/Integer — coerce explicitly
    // (temp functions bypass the analyzer's implicit-cast machinery)
    def d(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.DoubleType)
    def i(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.IntegerType)
    r1("st_point", es => StPoint(d(es(0)), d(es(1))))
    r1("st_geomfromtext", es => StGeomFromText(es.head))
    r1("st_astext", es => StAsText(es.head))
    r1("st_x", es => StX(es.head))
    r1("st_y", es => StY(es.head))
    r1("st_geometrytype", es => StGeometryType(es.head))
    r1("st_envelope", es => StEnvelope(es.head))
    r1("st_area", es => StArea(es.head))
    r1("st_length", es => StLength(es.head))
    r1("st_distance", es => StDistance(es(0), es(1)))
    r1("st_dwithin", es => StDWithin(es(0), es(1), es(2)))
    r1("st_distance_sphere", es => StDistanceSphere(es(0), es(1), es(2), es(3)))
    r1("cell_parent", es => CellParent(es.head))
    r1("st_intersects", es => StIntersects(es(0), es(1)))
    r1("st_contains", es => StContains(es(0), es(1)))
    r1("st_contains_point", es => StContainsPoint(es(0), d(es(1)), d(es(2))))
    r1("st_intersects_point", es => StIntersectsPoint(es(0), d(es(1)), d(es(2))))
    r1("st_transform", es => StTransform(es(0), i(es(1)), i(es(2))))
    r1("st_transform_srs", es => StTransformSrs(es(0), es(1), es(2)))
    r1("cell_of", es => CellOf(d(es(0)), d(es(1)), i(es(2))))
    r1("cells_covering", es => CellsCovering(es(0), i(es(1))))
    r1("geo_extract", es => GeoExtract(es.head))
    r1("st_convexhull", es => StConvexHull(es.head))
    r1("st_buffer", es => StBuffer(es(0), d(es(1))))
    r1("st_curvetoline", es => StCurveToLine(es(0), d(es(1))))
    r1("st_curve_contains_point", es =>
      StCurveContainsPoint(es(0), d(es(1)), d(es(2)), d(es(3))))
    r1("st_boundary", es => StGeomMisc(es.head, 0))
    r1("st_delaunay", es => StGeomMisc(es.head, 1))
    r1("st_pointonsurface", es => StGeomMisc(es.head, 2))
    r1("st_intersection", es => StOverlay(es(0), es(1), 0))
    r1("st_union", es => StOverlay(es(0), es(1), 1))
    r1("st_difference", es => StOverlay(es(0), es(1), 2))
    r1("st_symdifference", es => StOverlay(es(0), es(1), 3))
    r1("st_force_polygon", es => StForce(es.head, toMulti = false))
    r1("st_force_multipolygon", es => StForce(es.head, toMulti = true))
    r1("st_simplify", es => StSimplify(es(0), d(es(1))))
    r1("st_simplify_preserve_topology", es => StSimplifyPT(es(0), d(es(1))))
    r1("st_polygonize", es => StPolygonize(es.head))
    r1("st_makevalid", es => StMakeValid(es.head,
      if (es.length > 1) es(1)
      else org.apache.spark.sql.catalyst.expressions.Literal("LINEWORK")))
    r1("st_numpoints", es => StNumPoints(es.head))
    r1("st_centroid", es => StCentroid(es.head))
    r1("st_asgeojson", es => StAsGeoJson(es.head))
    r1("st_geomfromgeojson", es => StGeomFromGeoJson(es.head))
    r1("st_asgml", es => StAsGml(es.head))
    r1("st_geomfromgml", es => StGeomFromGml(es.head))
    r1("st_numgeometries", es => StNumGeometries(es.head))
    r1("ogr_style_part_count", es => OgrStylePartCount(es.head))
    r1("ogr_style_part", es => OgrStyleBinary(es(0), i(es(1)), 0))
    r1("ogr_style_tool", es => OgrStyleToolName(es.head))
    r1("ogr_style_param", es => OgrStyleBinary(es(0), es(1), 1))
    r1("ogr_style_param_unit", es => OgrStyleBinary(es(0), es(1), 2))
    r1("st_segmentize", es => StSegmentize(es(0), d(es(1))))
    // aggregate (UDAF path, not FunctionRegistry)
    spark.udf.register("st_union_agg",
      org.apache.spark.sql.functions.udaf(new graft.operators.Dissolve.UnionAgg,
        org.apache.spark.sql.Encoders.BINARY))
    r1("minhash_sig", es => MinHashSig(es(0), i(es(1)), i(es(2))))
    r1("simhash64", es => SimHash64(es.head))
    r1("doc_fingerprint", es => DocFingerprint(es.head))
    r1("lang_id", es => LangId(es.head))
    r1("ngram_jaccard", es => NgramJaccard(es(0), es(1), i(es(2))))
    r1("hamming64", es => Hamming64(es(0), es(1)))
    r1("hstore_get_value", es => HStoreGetValue(es(0), es(1)))
  }
}
