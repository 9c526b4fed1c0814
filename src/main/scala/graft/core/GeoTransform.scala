package graft.core

/** Affine geotransform, GDAL's 6-double convention
  * (`/root/reference/gdal/alg/gdaltransformer.cpp:3065-3073`
  * GDALApplyGeoTransform):
  *   X = gt0 + px*gt1 + ln*gt2
  *   Y = gt3 + px*gt4 + ln*gt5
  * Inverse per GDALInvGeoTransform (general 2x2 inversion).
  */
final case class GeoTransform(gt0: Double, gt1: Double, gt2: Double,
                              gt3: Double, gt4: Double, gt5: Double) {

  def applyFwd(px: Double, ln: Double): (Double, Double) =
    (gt0 + px * gt1 + ln * gt2, gt3 + px * gt4 + ln * gt5)

  def geoX(px: Double, ln: Double): Double = gt0 + px * gt1 + ln * gt2
  def geoY(px: Double, ln: Double): Double = gt3 + px * gt4 + ln * gt5

  /** Inverse transform, or None when the determinant is 0. */
  lazy val inverse: Option[GeoTransform] = {
    val det = gt1 * gt5 - gt2 * gt4
    if (det == 0.0) None
    else {
      val invDet = 1.0 / det
      Some(GeoTransform(
        (gt2 * gt3 - gt0 * gt5) * invDet,
        gt5 * invDet,
        -gt2 * invDet,
        (-gt1 * gt3 + gt0 * gt4) * invDet,
        -gt4 * invDet,
        gt1 * invDet))
    }
  }

  /** geo → (pixel, line), continuous coordinates. */
  def toPixel(x: Double, y: Double): (Double, Double) = {
    val inv = inverse.getOrElse(throw new IllegalArgumentException("non-invertible geotransform"))
    (inv.geoX(x, y), inv.geoY(x, y))
  }

  def toArray: Array[Double] = Array(gt0, gt1, gt2, gt3, gt4, gt5)
}

object GeoTransform {
  val identity: GeoTransform = GeoTransform(0, 1, 0, 0, 0, 1)
  def of(a: Array[Double]): GeoTransform = GeoTransform(a(0), a(1), a(2), a(3), a(4), a(5))
  /** North-up transform: origin at (minX, maxY), square-ish pixels. */
  def northUp(minX: Double, maxY: Double, pxW: Double, pxH: Double): GeoTransform =
    GeoTransform(minX, pxW, 0, maxY, 0, -pxH)
}
