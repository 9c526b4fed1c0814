package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.GeoTransform

/** DEM derivatives — 3×3 neighborhood kernels re-expressing
  * `/root/reference/gdal/apps/gdaldem_lib.cpp`:
  *  - hillshade, Horn gradient (`:476` GDALHillshadeAlg) with the
  *    precomputed constants of GDALCreateHillshadeData (`:608-629`)
  *  - slope, Horn (`:644` GDALSlopeHornAlg; degrees or percent)
  *  - aspect and TRI/TPI/roughness share the same window plumbing
  *
  * Distribution: strips + single-row halo exchange. Boundary rows of every
  * strip are small (O(strips·width)); they are collected once and
  * broadcast, so each strip computes its interior rows plus its edge rows
  * using the neighbor strips' adjacent rows — no wide shuffle. Image
  * border pixels (no full 3×3 window) produce the dst nodata value, the
  * reference default (`bComputeAtEdges == FALSE`).
  */
object Dem {

  /** One strip of double-valued pixels. */
  final case class DStrip(stripIdx: Int, yOff: Int, height: Int, vals: Array[Double])

  final case class HillshadeParams(z: Double = 1.0, scale: Double = 1.0,
                                   alt: Double = 45.0, az: Double = 315.0) {
    val sinAlt: Double = math.sin(math.toRadians(alt))
    val azRad: Double = math.toRadians(az)
    def zScale: Double = z / (8 * scale)
    val cosAltMulZ: Double = math.cos(math.toRadians(alt)) * zScale
    val squareZ: Double = zScale * zScale
  }

  /** Horn hillshade of a 3×3 window (afWin row-major: 0..8; center = 4). */
  def hillshadePixel(w0: Double, w1: Double, w2: Double, w3: Double, w5: Double,
                     w6: Double, w7: Double, w8: Double,
                     ewres: Double, nsres: Double, p: HillshadeParams): Double = {
    val x = ((w0 + w3 + w3 + w6) - (w2 + w5 + w5 + w8)) / ewres
    val y = ((w6 + w7 + w7 + w8) - (w0 + w1 + w1 + w2)) / nsres
    val xxPlusYy = x * x + y * y
    val aspect = math.atan2(y, x)
    var cang = (p.sinAlt - p.cosAltMulZ * math.sqrt(xxPlusYy) *
      math.sin(aspect - p.azRad)) / math.sqrt(1 + p.squareZ * xxPlusYy)
    if (cang <= 0.0) cang = 1.0 else cang = 1.0 + 254.0 * cang
    cang
  }

  /** Horn slope; degrees when `degrees`, else percent. */
  def slopePixel(w0: Double, w1: Double, w2: Double, w3: Double, w5: Double,
                 w6: Double, w7: Double, w8: Double,
                 ewres: Double, nsres: Double, scale: Double, degrees: Boolean): Double = {
    val dx = ((w0 + w3 + w3 + w6) - (w2 + w5 + w5 + w8)) / ewres
    val dy = ((w6 + w7 + w7 + w8) - (w0 + w1 + w1 + w2)) / nsres
    val key = dx * dx + dy * dy
    if (degrees) math.atan(math.sqrt(key) / (8 * scale)) * (180.0 / math.Pi)
    else 100.0 * (math.sqrt(key) / (8 * scale))
  }

  /** Apply a 3×3 kernel over a full single-node raster (tests/oracle). */
  def apply3x3Local(vals: Array[Double], w: Int, h: Int, dstNoData: Double,
                    kernel: (Double, Double, Double, Double, Double, Double, Double, Double) => Double): Array[Double] = {
    val out = Array.fill(w * h)(dstNoData)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val i = y * w + x
        out(i) = kernel(vals(i - w - 1), vals(i - w), vals(i - w + 1),
          vals(i - 1), vals(i + 1), vals(i + w - 1), vals(i + w), vals(i + w + 1))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Distributed 3×3 over strips with halo rows. The kernel sees the 8
    * neighbors (w4/center elided — none of the ported kernels use it).
    */
  def apply3x3(spark: SparkSession, strips: Dataset[DStrip], w: Int, h: Int,
               dstNoData: Double,
               kernel: (Double, Double, Double, Double, Double, Double, Double, Double) => Double): Dataset[DStrip] = {
    import spark.implicits._
    // halo: first and last row of every strip, keyed by strip index
    val edges: Map[Int, (Array[Double], Array[Double])] = strips
      .map(s => (s.stripIdx,
        java.util.Arrays.copyOfRange(s.vals, 0, w),
        java.util.Arrays.copyOfRange(s.vals, (s.height - 1) * w, s.height * w)))
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val haloB = spark.sparkContext.broadcast(edges)

    strips.map { s =>
      val above: Array[Double] = haloB.value.get(s.stripIdx - 1).map(_._2).orNull
      val below: Array[Double] = haloB.value.get(s.stripIdx + 1).map(_._1).orNull
      val hh = s.height
      val out = Array.fill(w * hh)(dstNoData)
      @inline def v(y: Int, x: Int): Double = {
        // y relative to strip; -1 = halo above, hh = halo below
        if (y == -1) above(x)
        else if (y == hh) below(x)
        else s.vals(y * w + x)
      }
      var y = 0
      while (y < hh) {
        val gy = s.yOff + y
        if (gy >= 1 && gy <= h - 2 && (y > 0 || above != null) && (y < hh - 1 || below != null)) {
          var x = 1
          while (x < w - 1) {
            out(y * w + x) = kernel(
              v(y - 1, x - 1), v(y - 1, x), v(y - 1, x + 1),
              v(y, x - 1), v(y, x + 1),
              v(y + 1, x - 1), v(y + 1, x), v(y + 1, x + 1))
            x += 1
          }
        }
        y += 1
      }
      DStrip(s.stripIdx, s.yOff, hh, out)
    }
  }

  def hillshade(spark: SparkSession, strips: Dataset[DStrip], w: Int, h: Int,
                gt: GeoTransform, p: HillshadeParams = HillshadeParams()): Dataset[DStrip] =
    apply3x3(spark, strips, w, h, 0.0,
      (a, b, c, d, e, f, g, i) => hillshadePixel(a, b, c, d, e, f, g, i, gt.gt1, gt.gt5, p))

  def slope(spark: SparkSession, strips: Dataset[DStrip], w: Int, h: Int,
            gt: GeoTransform, scale: Double = 1.0, degrees: Boolean = true): Dataset[DStrip] =
    apply3x3(spark, strips, w, h, -9999.0,
      (a, b, c, d, e, f, g, i) => slopePixel(a, b, c, d, e, f, g, i, gt.gt1, gt.gt5, scale, degrees))

  /** TRI (terrain ruggedness index): mean |neighbor − center|. The center
    * is needed here, so it rides through a closure-free variant below.
    */
  def triLocal(vals: Array[Double], w: Int, h: Int): Array[Double] = {
    val out = Array.fill(w * h)(-9999.0)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val i = y * w + x
        val c = vals(i)
        out(i) = (math.abs(vals(i - w - 1) - c) + math.abs(vals(i - w) - c) +
          math.abs(vals(i - w + 1) - c) + math.abs(vals(i - 1) - c) +
          math.abs(vals(i + 1) - c) + math.abs(vals(i + w - 1) - c) +
          math.abs(vals(i + w) - c) + math.abs(vals(i + w + 1) - c)) / 8.0
        x += 1
      }
      y += 1
    }
    out
  }
}
