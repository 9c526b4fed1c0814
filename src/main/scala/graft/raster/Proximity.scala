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

  /** Exact port of the reference's two-pass scanline propagation
    * (`gdalproximity.cpp:300-560`: top-down then bottom-up, each line
    * swept in both directions, nearest-target (x, y) carried per column).
    * Float arithmetic mirrored where the reference uses float. Returns
    * the float proximity raster AFTER post-processing (nodata fill,
    * FIXED_BUF_VAL, distMult).
    */
  def proximityExact(vals: Array[Int], w: Int, h: Int,
                     targetValues: Seq[Int] = Nil,
                     maxDist0: Double = Double.NaN,
                     noData: Float = 65535.0f,
                     fixedBufVal: Option[Double] = None,
                     distMult: Double = 1.0): Array[Float] = {
    val maxDist = if (maxDist0.isNaN) (w + h).toDouble else maxDist0 / distMult
    val out = new Array[Float](w * h)
    val nearX = Array.fill(w)(-1)
    val nearY = Array.fill(w)(-1)
    val prox = new Array[Float](w)

    def processLine(line: Int, forward: Boolean): Unit = {
      val (start, end, step) = if (forward) (0, w, 1) else (w - 1, -1, -1)
      var i = start
      while (i != end) {
        val v = vals(line * w + i)
        val isTarget =
          if (targetValues.isEmpty) v != 0 else targetValues.contains(v)
        if (isTarget) {
          prox(i) = 0.0f
          nearX(i) = i
          nearY(i) = line
        } else {
          var nearDistSq = (math.max(maxDist, w) * math.max(maxDist, w) * 2).toFloat
          if (nearX(i) != -1) {
            val d = ((nearX(i) - i) * (nearX(i) - i) +
              (nearY(i) - line) * (nearY(i) - line)).toFloat
            if (d < nearDistSq) nearDistSq = d
            else { nearX(i) = -1; nearY(i) = -1 }
          }
          val iLast = i - step
          if (i != start && nearX(iLast) != -1) {
            val d = ((nearX(iLast) - i) * (nearX(iLast) - i) +
              (nearY(iLast) - line) * (nearY(iLast) - line)).toFloat
            if (d < nearDistSq) {
              nearDistSq = d
              nearX(i) = nearX(iLast); nearY(i) = nearY(iLast)
            }
          }
          val iTR = i + step
          if (iTR != end && nearX(iTR) != -1) {
            val d = ((nearX(iTR) - i) * (nearX(iTR) - i) +
              (nearY(iTR) - line) * (nearY(iTR) - line)).toFloat
            if (d < nearDistSq) {
              nearDistSq = d
              nearX(i) = nearX(iTR); nearY(i) = nearY(iTR)
            }
          }
          if (nearX(i) != -1 && nearDistSq <= maxDist * maxDist &&
              (prox(i) < 0 || nearDistSq < prox(i) * prox(i)))
            prox(i) = math.sqrt(nearDistSq).toFloat
        }
        i += step
      }
    }

    // pass 1: top to bottom
    var line = 0
    while (line < h) {
      java.util.Arrays.fill(prox, -1.0f)
      processLine(line, forward = true)
      processLine(line, forward = false)
      System.arraycopy(prox, 0, out, line * w, w)
      line += 1
    }
    // pass 2: bottom to top
    java.util.Arrays.fill(nearX, -1)
    java.util.Arrays.fill(nearY, -1)
    line = h - 1
    while (line >= 0) {
      System.arraycopy(out, line * w, prox, 0, w)
      processLine(line, forward = false)
      processLine(line, forward = true)
      var i = 0
      while (i < w) {
        if (prox(i) < 0.0f) prox(i) = noData
        else if (prox(i) > 0.0f)
          prox(i) = fixedBufVal.map(_.toFloat).getOrElse((prox(i) * distMult).toFloat)
        i += 1
      }
      System.arraycopy(prox, 0, out, line * w, w)
      line -= 1
    }
    out
  }

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
