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
      tieBreak = Seq(lon, lat))
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
}
