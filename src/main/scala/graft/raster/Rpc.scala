package graft.raster

/** Rational polynomial coefficient (RPC) georeferencing —
  * `/root/reference/gdal/alg/gdal_rpc.cpp` (GDALCreateRPCTransformer):
  * the satellite-sensor model mapping (long, lat, height) → (pixel, line)
  * through ratios of cubic polynomials over normalized coordinates, with
  * the reference's exact 20-term order (`gdal_rpc.cpp:155` RPCComputeTerms)
  * and the `·scale + off + 0.5` pixel convention (`:331`).
  *
  * The FORWARD direction (geo → pixel) is exactly what [[Warp.warp]] pulls
  * with (pass `forwardTx(h)` as `tx` with an identity source geotransform,
  * like [[GcpTransform]]); the geodetic inverse (pixel → geo) iterates a
  * linearized correction like the reference's RPCInverseTransformPoint
  * (`gdal_rpc.cpp:795`, constant-height case — DEM-driven height lookup is
  * out of scope here).
  */
object Rpc extends Serializable {

  /** The 90 standard RPC values (NITF RPC00B naming, as GDAL stores them). */
  final case class Model(
      lineOff: Double, lineScale: Double,
      sampOff: Double, sampScale: Double,
      latOff: Double, latScale: Double,
      longOff: Double, longScale: Double,
      heightOff: Double, heightScale: Double,
      lineNum: Array[Double], lineDen: Array[Double],
      sampNum: Array[Double], sampDen: Array[Double]) {
    require(lineNum.length == 20 && lineDen.length == 20 &&
      sampNum.length == 20 && sampDen.length == 20, "RPC needs 4×20 coefficients")
  }

  /** RPCComputeTerms (`gdal_rpc.cpp:155`) — exact term order. */
  private def terms(l: Double, p: Double, h: Double): Array[Double] = Array(
    1.0, l, p, h, l * p, l * h, p * h, l * l, p * p, h * h,
    l * p * h, l * l * l, l * p * p, l * h * h, l * l * p,
    p * p * p, p * h * h, l * l * h, p * p * h, h * h * h)

  @inline private def eval(t: Array[Double], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < 20) { s += t(i) * c(i); i += 1 }
    s
  }

  /** Forward model: (long, lat, height) → (pixel, line), GDAL pixel
    * convention (continuous coords where the pixel center is at +0.5).
    */
  def forward(m: Model, lon: Double, lat: Double, h: Double): (Double, Double) = {
    val t = terms((lon - m.longOff) / m.longScale,
      (lat - m.latOff) / m.latScale, (h - m.heightOff) / m.heightScale)
    val x = eval(t, m.sampNum) / eval(t, m.sampDen)
    val y = eval(t, m.lineNum) / eval(t, m.lineDen)
    (x * m.sampScale + m.sampOff + 0.5, y * m.lineScale + m.lineOff + 0.5)
  }

  /** Warp pull transform at a constant height: dst geo (lon, lat) →
    * src pixel. Use with `srcGt = GeoTransform(0,1,0,0,0,1)`.
    */
  def forwardTx(m: Model, height: Double = 0.0): Warp.GeoTx =
    (lon, lat) => forward(m, lon, lat, height)

  /** Geodetic inverse at constant height: (pixel, line) → (long, lat) by
    * iterating a linearized correction from the forward model around the
    * offset point (reference `RPCInverseTransformPoint`, no-DEM path).
    * Throws if the iteration does not reach `tolPx` pixels.
    */
  def inverse(m: Model, pixel: Double, line: Double, height: Double = 0.0,
              tolPx: Double = 1e-8, maxIter: Int = 40): (Double, Double) = {
    // local linearization at the model center: d(pixel,line)/d(long,lat)
    val eps = 1e-6
    val (px0, py0) = forward(m, m.longOff, m.latOff, height)
    val (pxL, pyL) = forward(m, m.longOff + eps * m.longScale, m.latOff, height)
    val (pxP, pyP) = forward(m, m.longOff, m.latOff + eps * m.latScale, height)
    val a = (pxL - px0) / (eps * m.longScale); val b = (pxP - px0) / (eps * m.latScale)
    val c = (pyL - py0) / (eps * m.longScale); val d = (pyP - py0) / (eps * m.latScale)
    val det = a * d - b * c
    require(math.abs(det) > 1e-20, "RPC: degenerate linearization")
    var lon = m.longOff + ( d * (pixel - px0) - b * (line - py0)) / det
    var lat = m.latOff + (-c * (pixel - px0) + a * (line - py0)) / det
    var it = 0
    while (it < maxIter) {
      val (bx, by) = forward(m, lon, lat, height)
      val ex = pixel - bx; val ey = line - by
      if (math.abs(ex) < tolPx && math.abs(ey) < tolPx) return (lon, lat)
      lon += ( d * ex - b * ey) / det
      lat += (-c * ex + a * ey) / det
      it += 1
    }
    throw new IllegalStateException(
      s"RPC inverse did not converge to $tolPx px in $maxIter iterations at ($pixel,$line)")
  }
}
