package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.raster.Overview.IStrip
import graft.raster.Dem.DStrip

/** Proximity raster — distance from every pixel to the nearest target
  * pixel (`/root/reference/gdal/alg/gdalproximity.cpp:103`
  * GDALComputeProximity: VALUES target set, MAXDIST cap, DISTUNITS
  * PIXEL/GEO, NODATA fill).
  *
  * The reference uses a sequential two-pass scanline propagation (an
  * 8SSEDT-style approximation). That algorithm is inherently serial in y,
  * so the distributed re-expression inverts the data flow: target pixels
  * (typically sparse) are gathered once into a k-d tree broadcast to every
  * strip, and each strip computes exact euclidean nearest-target distances
  * independently — embarrassingly parallel, and *exact* where the
  * reference's propagation is approximate. Dense-target rasters should use
  * the cell-bucketed kNN join instead of the broadcast tree.
  */
object Proximity {

  /** @param targetValues pixel values considered targets
    * @param maxDist cap; farther pixels get `noData`
    * @param pixelDist distance per pixel step (1.0 = DISTUNITS=PIXEL;
    *                  the geotransform cell size for GEO)
    */
  def proximity(spark: SparkSession, strips: Dataset[IStrip], w: Int, h: Int,
                targetValues: Set[Int], maxDist: Double = Double.MaxValue,
                noData: Double = 65535.0, pixelDist: Double = 1.0): Dataset[DStrip] = {
    import spark.implicits._
    val targets = strips.flatMap { s =>
      val out = Seq.newBuilder[(Int, Int)]
      var r = 0
      while (r < s.height) {
        var c = 0
        while (c < s.width) {
          if (targetValues.contains(s.vals(r * s.width + c))) out += ((c, s.yOff + r))
          c += 1
        }
        r += 1
      }
      out.result().iterator
    }.collect()
    require(targets.nonEmpty, "proximity: no target pixels")
    val tree = graft.index.KdTree.build(
      targets.map(_._1.toDouble), targets.map(_._2.toDouble),
      Array.tabulate(targets.length)(_.toLong))
    val treeB = spark.sparkContext.broadcast(tree)

    strips.map { s =>
      val t = treeB.value
      val out = new Array[Double](s.width * s.height)
      var r = 0
      while (r < s.height) {
        var c = 0
        while (c < s.width) {
          val nn = t.knn(c.toDouble, (s.yOff + r).toDouble, 1)
          val d = math.sqrt(nn(0)._1) * pixelDist
          out(r * s.width + c) = if (d > maxDist) noData else d
          c += 1
        }
        r += 1
      }
      DStrip(s.stripIdx, s.yOff, s.height, out)
    }
  }
}
