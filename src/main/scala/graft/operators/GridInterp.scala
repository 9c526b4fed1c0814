package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gf

/** Gridding / interpolation aggregates — the distributed re-expression of
  * `/root/reference/gdal/alg/gdalgrid.cpp`:
  *  - data-metrics per output cell (count / min / max / range / average
  *    distance; `gdalgrid.cpp:794-1000`) become a plain groupBy(cell).agg
  *    with map-side partial aggregation;
  *  - inverse-distance-to-a-power with nearest-neighbor search
  *    (`gdalgrid.cpp:265` GDALGridInverseDistanceToAPowerNearestNeighbor):
  *    weight = 1/(r²)^(p/2) over the k closest samples within a radius,
  *    exact-hit short-circuit, nodata below minPoints — the quadtree
  *    search is replaced by the cell-ring kNN join.
  */
object GridInterp {

  /** Per-cell data metrics of a point set (gdalgrid "metrics" family). */
  def cellMetrics(points: DataFrame, lon: Column, lat: Column, value: Column,
                  res: Int): DataFrame =
    points.groupBy(gf.cell_of(lon, lat, res).as("cell"))
      .agg(count(lit(1)).as("n"),
        min(value).as("min_v"), max(value).as("max_v"),
        (max(value) - min(value)).as("range_v"),
        avg(value).as("avg_v"))

  /** IDW-NN interpolation at query points.
    *
    * @param points samples with a value column
    * @param queries small set of (qid, qlon, qlat) interpolation sites
    * @param k nMaxPoints (closest-k cap)
    * @param minPoints below this → nodata
    * @param power weighting power p
    */
  def idwNearestNeighbor(points: DataFrame, lon: Column, lat: Column, value: Column,
                         queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
                         k: Int, res: Int, power: Double = 2.0,
                         minPoints: Int = 1, noData: Double = 0.0): DataFrame = {
    val pts = points.withColumn("__v", value)
    val knn = KnnJoin(pts, lon, lat, queries, qid, qlon, qlat, k, res,
      initialRing = 2, tieBreak = Seq(lon, lat))
    // weight 1/(r2)^(p/2); exact hits (r2 ~ 0) take the sample value
    // directly (reference threshold 1e-13 on r², gdalgrid.cpp:341)
    val r2 = col("dist") * col("dist")
    val exactHit = r2 < 1e-13
    val invW = lit(1.0) / pow(r2, power / 2.0)
    knn.groupBy(col("qid"))
      .agg(
        max(when(exactHit, col("__v"))).as("__exact"),
        sum(when(!exactHit, invW * col("__v")).otherwise(0.0)).as("__nom"),
        sum(when(!exactHit, invW).otherwise(0.0)).as("__den"),
        count(lit(1)).as("__n"))
      .select(col("qid"),
        when(col("__exact").isNotNull, col("__exact"))
          .when(col("__n") < minPoints || col("__den") === 0.0, lit(noData))
          .otherwise(col("__nom") / col("__den")).as("idw"))
  }

  /** Candidate (query, point) pairs within the search-ellipse bounding box
    * via cell bucketing: the query side explodes the cell range its bbox
    * covers, then equi-joins the single-cell point side. Shared by the
    * ellipse-search algorithms below.
    */
  private def ellipseCandidates(points: DataFrame, lon: Column, lat: Column, value: Column,
                                queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
                                radius1: Double, radius2: Double, angle: Double,
                                res: Int): DataFrame = {
    val n = graft.index.CellGrid.cellsPerAxis(res)
    val rmax = math.max(radius1, radius2)
    @inline def ixExpr(c: Column, lo: Double, span: Double): Column =
      least(greatest(floor((c + lo) / span * n), lit(0.0)), lit((n - 1).toDouble)).cast("long")
    val q = queries.select(qid.cast("long").as("__qid"),
        qlon.cast("double").as("__qlon"), qlat.cast("double").as("__qlat"))
      .withColumn("__cx0", ixExpr(col("__qlon") - rmax, 180.0, 360.0))
      .withColumn("__cx1", ixExpr(col("__qlon") + rmax, 180.0, 360.0))
      .withColumn("__cy0", ixExpr(col("__qlat") - rmax, 90.0, 180.0))
      .withColumn("__cy1", ixExpr(col("__qlat") + rmax, 90.0, 180.0))
      .withColumn("__cx", explode(sequence(col("__cx0"), col("__cx1"))))
      .withColumn("__cy", explode(sequence(col("__cy0"), col("__cy1"))))
      .withColumn("__qcell", lit(res.toLong << 52) + col("__cx") * (1L << 26) + col("__cy"))
      .select(col("__qid"), col("__qlon"), col("__qlat"), col("__qcell"))
    val pts = points.select(lon.cast("double").as("__px"),
        lat.cast("double").as("__py"), value.cast("double").as("__v"))
      .withColumn("__pcell", gf.cell_of(col("__px"), col("__py"), res))
    // ellipse membership mirror of gdalgrid.cpp:587: rotate, then
    // r2²·RX² + r1²·RY² ≤ r1²·r2²
    val r1sq = radius1 * radius1
    val r2sq = radius2 * radius2
    val aRad = math.toRadians(angle)
    val (c1, c2) = (math.cos(aRad), math.sin(aRad))
    val rx0 = col("__px") - col("__qlon")
    val ry0 = col("__py") - col("__qlat")
    val (rx, ry) =
      if (angle == 0.0) (rx0, ry0)
      else (rx0 * c1 + ry0 * c2, ry0 * c1 - rx0 * c2)
    pts.join(q, col("__pcell") === col("__qcell"))
      .withColumn("__rx", rx).withColumn("__ry", ry)
      .filter(col("__rx") * col("__rx") * r2sq + col("__ry") * col("__ry") * r1sq
        <= r1sq * r2sq)
  }

  /** Moving average (`gdalgrid.cpp:540` GDALGridMovingAverage): mean of
    * all samples inside the search ellipse; < minPoints → noData.
    */
  def movingAverage(points: DataFrame, lon: Column, lat: Column, value: Column,
                    queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
                    radius1: Double, radius2: Double, res: Int,
                    angle: Double = 0.0, minPoints: Int = 0,
                    noData: Double = 0.0): DataFrame = {
    val cand = ellipseCandidates(points, lon, lat, value,
      queries, qid, qlon, qlat, radius1, radius2, angle, res)
    val agg = cand.groupBy(col("__qid"))
      .agg(sum(col("__v")).as("__acc"), count(lit(1)).as("__n"))
    queries.select(qid.cast("long").as("qid")).distinct()
      .join(agg, col("qid") === col("__qid"), "left")
      .select(col("qid"),
        when(col("__n").isNull || col("__n") < math.max(minPoints, 1), lit(noData))
          .otherwise(col("__acc") / col("__n")).as("avg_v"))
  }

  /** Nearest neighbor (`gdalgrid.cpp:635` GDALGridNearestNeighbor): the
    * value of the closest sample inside the search ellipse; none → noData.
    * `tieBreak` replaces the reference's input-array-order tie (meaningless
    * under distribution) with an explicit deterministic order.
    */
  def nearestNeighbor(points: DataFrame, lon: Column, lat: Column, value: Column,
                      queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
                      radius1: Double, radius2: Double, res: Int,
                      angle: Double = 0.0, noData: Double = 0.0,
                      tieBreak: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = ellipseCandidates(points, lon, lat, value,
      queries, qid, qlon, qlat, radius1, radius2, angle, res)
    val r2 = col("__rx") * col("__rx") + col("__ry") * col("__ry")
    val tb = if (tieBreak.nonEmpty) tieBreak else Seq(col("__px"), col("__py"))
    val best = cand.withColumn("__r2", r2)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__qid")).orderBy(col("__r2") +: tb: _*)))
      .filter(col("__rn") === 1)
      .select(col("__qid"), col("__v"))
    queries.select(qid.cast("long").as("qid")).distinct()
      .join(best, col("qid") === col("__qid"), "left")
      .select(col("qid"), coalesce(col("__v"), lit(noData)).as("nn_v"))
  }

  /** Linear (Delaunay) interpolation (GDALGridLinear): the sample set is
    * triangulated ONCE (driver — the reference also holds every point in
    * memory for its global triangulation) and the triangulation broadcast;
    * queries interpolate barycentrically in parallel. Outside the hull →
    * noData.
    */
  def linear(points: DataFrame, lon: Column, lat: Column, value: Column,
             queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
             noData: Double = 0.0, maxSamples: Long = 2000000L): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // the reference's GDALGridLinear also holds every sample in memory for
    // one global triangulation; guard the collect LOUDLY so a 100× user
    // gets an actionable error instead of a driver OOM (IDW/nearest are
    // the distributed siblings for large sample sets)
    val nSamples = points.count()
    require(nSamples <= maxSamples,
      s"GridInterp.linear: $nSamples samples exceed the driver-side " +
        s"triangulation cap ($maxSamples) — use idw/nearest (distributed) " +
        "or raise maxSamples explicitly")
    val collected = points.select(lon.cast("double"), lat.cast("double"),
      value.cast("double")).as[(Double, Double, Double)].collect()
    // dedupe by (x, y) keeping the first value — duplicate coordinates
    // corrupt the Bowyer-Watson cavity (matching delaunayTriangulation's
    // .distinct hygiene)
    val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
    val samples = collected.filter(s => seen.add((s._1, s._2)))
    val xs = samples.map(_._1); val ys = samples.map(_._2); val zs = samples.map(_._3)
    val tris = graft.core.Delaunay.triangulate(xs, ys)
    val bc = spark.sparkContext.broadcast((xs, ys, zs, tris))
    queries.select(qid.cast("long").as("qid"),
        qlon.cast("double").as("qlon"), qlat.cast("double").as("qlat"))
      .as[(Long, Double, Double)]
      .map { case (id, qx, qy) =>
        val (bxs, bys, bzs, btris) = bc.value
        (id, graft.core.Delaunay.interpolate(bxs, bys, bzs, btris, qx, qy)
          .getOrElse(noData))
      }.toDF("qid", "lin_v")
  }
}
