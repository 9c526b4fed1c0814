package graft.raster

/** GCP-based georeferencing transformers feeding [[Warp.GeoTx]] — for
  * sources with no affine geotransform (scanned maps, historical imagery,
  * satellite raw): the re-expression of
  * `/root/reference/gdal/alg/gdal_crs.c:170` (GDALCreateGCPTransformer,
  * least-squares polynomial order 1/2/3) and
  * `/root/reference/gdal/alg/gdal_tps.cpp:102` (GDALCreateTPSTransformer,
  * thin-plate spline), selectable like `gdalwarp -order N` / `-tps`.
  *
  * Both directions are fitted INDEPENDENTLY from the same GCPs (as the
  * reference does — the exact inverse of a quadratic is not a quadratic,
  * so the pull-direction map is its own least-squares fit, not an
  * algebraic inversion).
  *
  * Usage with [[Warp.warp]]: the GCP inverse transform replaces the source
  * geotransform — pass `srcGt = GeoTransform(0,1,0,0,0,1)` (identity:
  * source pixel == source "geo") and `tx = GcpTransform.polyTx(gcps, n)`
  * (dst geo → src pixel), mirroring how GDALGenImgProjTransformer slots a
  * GCP transformer where the affine would sit
  * (`gdal/alg/gdaltransformer.cpp:975`).
  *
  * Numerical note: unlike the reference, inputs are internally normalized
  * to [−1, 1] before the normal equations are formed (the fitted MAP is
  * identical; the conditioning at UTM-sized coordinates is not).
  */
object GcpTransform extends Serializable {

  /** One ground control point: raw (pixel, line) ↔ georeferenced (x, y). */
  final case class Gcp(pixel: Double, line: Double, geoX: Double, geoY: Double)

  /** Polynomial terms x^i·y^j with i+j ≤ order (3 / 6 / 10 terms). */
  def termCount(order: Int): Int = (order + 1) * (order + 2) / 2

  private def terms(order: Int, x: Double, y: Double): Array[Double] = order match {
    case 1 => Array(1.0, x, y)
    case 2 => Array(1.0, x, y, x * x, x * y, y * y)
    case 3 => Array(1.0, x, y, x * x, x * y, y * y,
      x * x * x, x * x * y, x * y * y, y * y * y)
    case _ => throw new IllegalArgumentException(s"GCP polynomial order must be 1..3, got $order")
  }

  /** Dense Gaussian elimination with partial pivoting (small systems:
    * ≤10×10 for polynomials, (n+3)² for TPS with driver-scale GCP counts).
    */
  private[raster] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    var col = 0
    while (col < n) {
      var p = col; var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < n) { val v = math.abs(a(r)(col)); if (v > best) { best = v; p = r }; r += 1 }
      require(best > 1e-14, s"GCP fit: singular system at column $col (degenerate GCPs?)")
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
                      val tb = b(p); b(p) = b(col); b(col) = tb }
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Affine [−1,1] normalization of a coordinate set. */
  private final case class Norm(cx: Double, cy: Double, sx: Double, sy: Double) {
    @inline def x(v: Double): Double = (v - cx) * sx
    @inline def y(v: Double): Double = (v - cy) * sy
  }
  private def normOf(xs: Seq[Double], ys: Seq[Double]): Norm = {
    def mk(v: Seq[Double]): (Double, Double) = {
      val lo = v.min; val hi = v.max
      val c = (lo + hi) / 2
      val half = math.max((hi - lo) / 2, 1e-12)
      (c, 1.0 / half)
    }
    val (cx, sx) = mk(xs); val (cy, sy) = mk(ys)
    Norm(cx, cy, sx, sy)
  }

  /** Least-squares polynomial map (fromX,fromY) → to, via normal equations
    * in normalized space.
    */
  private def fitPoly(fromX: Seq[Double], fromY: Seq[Double], to: Seq[Double],
                      order: Int, nm: Norm): Array[Double] = {
    val k = termCount(order)
    val ata = Array.ofDim[Double](k, k)
    val atb = new Array[Double](k)
    var g = 0
    while (g < to.length) {
      val t = terms(order, nm.x(fromX(g)), nm.y(fromY(g)))
      var i = 0
      while (i < k) {
        atb(i) += t(i) * to(g)
        var j = 0
        while (j < k) { ata(i)(j) += t(i) * t(j); j += 1 }
        i += 1
      }
      g += 1
    }
    solve(ata, atb)
  }

  private def evalPoly(c: Array[Double], order: Int, nm: Norm,
                       x: Double, y: Double): Double = {
    val t = terms(order, nm.x(x), nm.y(y))
    var s = 0.0; var i = 0
    while (i < t.length) { s += c(i) * t(i); i += 1 }
    s
  }

  /** A fitted one-direction polynomial pair ((x,y) → (u,v)). */
  private def polyPair(fx: Seq[Double], fy: Seq[Double],
                       tu: Seq[Double], tv: Seq[Double], order: Int): Warp.GeoTx = {
    require(fx.length >= termCount(order),
      s"GCP polynomial order $order needs ≥ ${termCount(order)} GCPs, got ${fx.length}")
    val nm = normOf(fx, fy)
    val cu = fitPoly(fx, fy, tu, order, nm)
    val cv = fitPoly(fx, fy, tv, order, nm)
    (x, y) => (evalPoly(cu, order, nm, x, y), evalPoly(cv, order, nm, x, y))
  }

  /** Forward GCP polynomial: (pixel, line) → (geoX, geoY). */
  def polyFwd(gcps: Seq[Gcp], order: Int): Warp.GeoTx =
    polyPair(gcps.map(_.pixel), gcps.map(_.line),
      gcps.map(_.geoX), gcps.map(_.geoY), order)

  /** Inverse GCP polynomial: (geoX, geoY) → (pixel, line) — the pull
    * direction [[Warp.warp]] needs (`tx` with identity srcGt).
    */
  def polyTx(gcps: Seq[Gcp], order: Int): Warp.GeoTx =
    polyPair(gcps.map(_.geoX), gcps.map(_.geoY),
      gcps.map(_.pixel), gcps.map(_.line), order)

  // ------------------------------------------------------------------
  // Thin-plate spline (gdal_tps.cpp VizGeorefSpline2D): exact interpolation
  // at the GCPs, minimum bending energy in between.
  //   f(x,y) = a0 + a1·x + a2·y + Σ wᵢ·U(rᵢ),  U(r) = r²·ln(r²)
  // solved from [K P; Pᵀ 0]·[w; a] = [v; 0], one system per output dim.
  // ------------------------------------------------------------------

  @inline private def tpsU(dx: Double, dy: Double): Double = {
    val r2 = dx * dx + dy * dy
    if (r2 == 0.0) 0.0 else r2 * math.log(r2)
  }

  private def fitTps(fx: Array[Double], fy: Array[Double],
                     to: Array[Double]): Array[Double] = {
    val n = fx.length
    val m = n + 3
    val a = Array.ofDim[Double](m, m)
    val b = new Array[Double](m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { a(i)(j) = tpsU(fx(i) - fx(j), fy(i) - fy(j)); j += 1 }
      a(i)(n) = 1.0; a(i)(n + 1) = fx(i); a(i)(n + 2) = fy(i)
      a(n)(i) = 1.0; a(n + 1)(i) = fx(i); a(n + 2)(i) = fy(i)
      b(i) = to(i)
      i += 1
    }
    solve(a, b)
  }

  private def tpsPair(fx0: Seq[Double], fy0: Seq[Double],
                      tu: Seq[Double], tv: Seq[Double]): Warp.GeoTx = {
    require(fx0.length >= 3, s"TPS needs ≥ 3 GCPs, got ${fx0.length}")
    val nm = normOf(fx0, fy0)
    val fx = fx0.map(nm.x).toArray; val fy = fy0.map(nm.y).toArray
    val cu = fitTps(fx, fy, tu.toArray)
    val cv = fitTps(fx, fy, tv.toArray)
    val n = fx.length
    (x0, y0) => {
      val x = nm.x(x0); val y = nm.y(y0)
      var su = cu(n) + cu(n + 1) * x + cu(n + 2) * y
      var sv = cv(n) + cv(n + 1) * x + cv(n + 2) * y
      var i = 0
      while (i < n) {
        val u = tpsU(x - fx(i), y - fy(i))
        su += cu(i) * u; sv += cv(i) * u
        i += 1
      }
      (su, sv)
    }
  }

  /** Forward TPS: (pixel, line) → (geoX, geoY). */
  def tpsFwd(gcps: Seq[Gcp]): Warp.GeoTx =
    tpsPair(gcps.map(_.pixel), gcps.map(_.line),
      gcps.map(_.geoX), gcps.map(_.geoY))

  /** Inverse TPS: (geoX, geoY) → (pixel, line) — warp pull direction. */
  def tpsTx(gcps: Seq[Gcp]): Warp.GeoTx =
    tpsPair(gcps.map(_.geoX), gcps.map(_.geoY),
      gcps.map(_.pixel), gcps.map(_.line))
}
