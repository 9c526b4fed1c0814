package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.GeoTransform
import graft.raster.Dem.DStrip

/** Warp / reproject — the distributed re-expression of
  * `/root/reference/gdal/alg/gdalwarpoperation.cpp` +
  * `gdal/alg/gdalwarpkernel.cpp`:
  *
  *  - the reference chunks the OUTPUT raster and, per chunk, computes the
  *    source window via the inverse transformer chain
  *    (`GDALCreateGenImgProjTransformer`, `gdal/alg/gdaltransformer.cpp:975`
  *    = dst-gt ∘ CT⁻¹ ∘ src-gt⁻¹), reads that window, and resamples
  *    (`ChunkAndWarpImage`, `gdalwarpoperation.cpp:672`);
  *  - here the output chunk IS the Dataset partition: each dst strip's
  *    source row range is derived on the driver by transforming sample
  *    points of the strip outline, source rows are shipped to the dst
  *    strips that need them (row-range overlap, no broadcast of the whole
  *    raster), and the kernel runs per strip;
  *  - kernels: nearest + bilinear (the v1 slice per SURVEY.md §2.8; the
  *    remaining GWKResample kernels drop into the same sample() seam);
  *  - transforms: any affine pair, plus WGS84↔WebMercator through the
  *    [[graft.expr.GeoRt]] spherical formulas.
  */
object Warp {

  sealed trait Kernel
  case object Nearest extends Kernel
  case object Bilinear extends Kernel
  /** Catmull-Rom bicubic (`gdalwarpkernel.cpp:2252` CubicConvolution,
    * border pixels fall back to bilinear like GWKCubicResample4Sample).
    */
  case object Cubic extends Kernel
  /** Cubic B-Spline via the general weighted path (`:2540` GWKBSpline,
    * radius 2, edge-clipped weights normalized by ΣwH·ΣwV).
    */
  case object CubicSpline extends Kernel
  /** Lanczos windowed sinc, radius 3 (`:2369` GWKLanczosSinc). */
  case object Lanczos extends Kernel
  /** Source-footprint aggregates (`:4636` GWKAverageOrModeThread): the dst
    * pixel's corner square is transformed to source space; all source
    * pixels in the rect contribute.
    */
  sealed trait RectKernel extends Kernel
  case object Average extends RectKernel
  case object Mode extends RectKernel
  case object Max extends RectKernel
  case object Min extends RectKernel
  final case class Quantile(q: Double) extends RectKernel
  val Med: Quantile = Quantile(0.5)
  val Q1: Quantile = Quantile(0.25)
  val Q3: Quantile = Quantile(0.75)

  /** Geo-coordinate transform from DST CRS to SRC CRS (inverse direction,
    * as the warp pulls). Identity when both share a CRS.
    */
  type GeoTx = (Double, Double) => (Double, Double)

  val identityTx: GeoTx = (x, y) => (x, y)

  /** dst EPSG:3857 → src EPSG:4326 (pull direction for a 4326→3857 warp). */
  val mercToLonLat: GeoTx = (x, y) =>
    (graft.expr.GeoRt.mercXToLon(x), graft.expr.GeoRt.mercYToLat(y))

  val lonLatToMerc: GeoTx = (x, y) =>
    (graft.expr.GeoRt.lonToMercX(x), graft.expr.GeoRt.latToMercY(y))

  /** General dst-EPSG → src-EPSG pull transform through
    * [[graft.core.Proj]] (UTM/TMerc, LCC, polar stereo, LAEA, datum
    * shifts) — the warp-side face of `GDALCreateGenImgProjTransformer`
    * (`gdal/alg/gdaltransformer.cpp:975`). The 3857↔4326 pair keeps the
    * original spherical fast path so existing goldens stay byte-stable.
    */
  def epsgTx(dstEpsg: Int, srcEpsg: Int): GeoTx = (dstEpsg, srcEpsg) match {
    case (a, b) if a == b => identityTx
    case (3857, 4326) => mercToLonLat
    case (4326, 3857) => lonLatToMerc
    case _ =>
      val d = graft.core.Proj.byEpsg(dstEpsg).getOrElse(
        throw new IllegalArgumentException(s"warp: unsupported dst EPSG $dstEpsg"))
      val s = graft.core.Proj.byEpsg(srcEpsg).getOrElse(
        throw new IllegalArgumentException(s"warp: unsupported src EPSG $srcEpsg"))
      (x, y) => graft.core.Proj.transformPoint(d, s, x, y)
  }

  /** Continuous src pixel coords of a dst pixel center. */
  @inline private def srcPixelOf(dx: Int, dy: Int, dstGt: GeoTransform,
                                 tx: GeoTx, srcInv: GeoTransform): (Double, Double) = {
    val gx = dstGt.geoX(dx + 0.5, dy + 0.5)
    val gy = dstGt.geoY(dx + 0.5, dy + 0.5)
    val (sx, sy) = tx(gx, gy)
    (srcInv.geoX(sx, sy), srcInv.geoY(sx, sy))
  }

  /** Continuous src pixel coords of a dst pixel CORNER (rect kernels). */
  @inline private def srcCornerOf(dx: Double, dy: Double, dstGt: GeoTransform,
                                  tx: GeoTx, srcInv: GeoTransform): (Double, Double) = {
    val gx = dstGt.geoX(dx, dy)
    val gy = dstGt.geoY(dx, dy)
    val (sx, sy) = tx(gx, gy)
    (srcInv.geoX(sx, sy), srcInv.geoY(sx, sy))
  }

  /** GDALApproxTransformer analog (`gdal/alg/gdaltransformer.cpp`
    * GDALApproxTransform, gdalwarp's `-et`, default 0.125 src px): per
    * output scanline the exact dst→src transform is evaluated at segment
    * endpoints and the midpoint; if linear interpolation agrees with the
    * exact midpoint within `tol` source pixels the whole segment is
    * filled by interpolation, else it subdivides. Exact projective
    * transforms are trig-series per pixel (TMerc/LCC/stereo); the approx
    * path cuts that to O(log w) exact evaluations per smooth row.
    */
  private[graft] def approxRow(w: Int, dy: Int, dstGt: GeoTransform, tx: GeoTx,
                                srcInv: GeoTransform, tol: Double)
      : (Array[Double], Array[Double]) = {
    val sx = new Array[Double](w); val sy = new Array[Double](w)
    @inline def exact(c: Int): (Double, Double) =
      srcCornerOf(c + 0.5, dy + 0.5, dstGt, tx, srcInv)
    def fill(c0: Int, c1: Int, p0: (Double, Double), p1: (Double, Double)): Unit = {
      sx(c0) = p0._1; sy(c0) = p0._2
      sx(c1) = p1._1; sy(c1) = p1._2
      if (c1 - c0 <= 1) return
      val cm = (c0 + c1) / 2
      val pm = exact(cm)
      val t = (cm - c0).toDouble / (c1 - c0)
      val lx = p0._1 + t * (p1._1 - p0._1)
      val ly = p0._2 + t * (p1._2 - p0._2)
      if (math.abs(lx - pm._1) <= tol && math.abs(ly - pm._2) <= tol) {
        var c = c0 + 1
        while (c < c1) {
          val tt = (c - c0).toDouble / (c1 - c0)
          sx(c) = p0._1 + tt * (p1._1 - p0._1)
          sy(c) = p0._2 + tt * (p1._2 - p0._2)
          c += 1
        }
        sx(cm) = pm._1; sy(cm) = pm._2 // the measured midpoint is free
      } else {
        fill(c0, cm, p0, pm)
        fill(cm, c1, pm, p1)
      }
    }
    if (w == 1) { val p = exact(0); sx(0) = p._1; sy(0) = p._2 }
    else fill(0, w - 1, exact(0), exact(w - 1))
    (sx, sy)
  }

  /** Per-dst-pixel dispatch shared by the distributed and local paths. */
  @inline private def samplePixel(rows: Map[Int, Array[Double]], srcW: Int, srcH: Int,
                                  c: Int, gy: Int, dstGt: GeoTransform, tx: GeoTx,
                                  srcInv: GeoTransform, kernel: Kernel,
                                  noData: Double, xScale: Double, yScale: Double,
                                  srcNd: Double = 0.0, hasSrcNd: Boolean = false): Double = kernel match {
    case rk: RectKernel =>
      val (px1, py1) = srcCornerOf(c, gy, dstGt, tx, srcInv)
      val (px2, py2) = srcCornerOf(c + 1.0, gy + 1.0, dstGt, tx, srcInv)
      sampleRect(rows, srcW, srcH, px1, py1, px2, py2, rk, noData, srcNd, hasSrcNd)
    case _ =>
      val (px, py) = srcPixelOf(c, gy, dstGt, tx, srcInv)
      sample(rows, srcW, srcH, px, py, kernel, noData, xScale, yScale, srcNd, hasSrcNd)
  }

  /** CubicConvolution (`gdalwarpkernel.cpp:2252`). */
  @inline private def cubicConv(d1: Double, d2: Double, d3: Double,
                                f0: Double, f1: Double, f2: Double, f3: Double): Double =
    f1 + 0.5 * (d1 * (f2 - f0) + d2 * (2.0 * f0 - 5.0 * f1 + 4.0 * f2 - f3) +
      d3 * (3.0 * (f1 - f2) + f3 - f0))

  /** GWKBSpline (`:2526`; unnormalized — the general path divides by Σw). */
  @inline private def bsplineW(x: Double): Double = {
    val xp2 = x + 2.0; val xp1 = x + 1.0; val xm1 = x - 1.0
    val xp2c = xp2 * xp2 * xp2
    (if (xp2 > 0.0)
      (if (xp1 > 0.0)
        (if (x > 0.0)
          (if (xm1 > 0.0) -4.0 * xm1 * xm1 * xm1 else 0.0) + 6.0 * x * x * x
        else 0.0) + (-4.0) * xp1 * xp1 * xp1
      else 0.0) + xp2c
    else 0.0)
  }

  /** GWKLanczosSinc (`:2383`), radius 3. */
  @inline private def lanczosW(x: Double): Double =
    if (x == 0.0) 1.0
    else {
      val pix = math.Pi * x
      val pixOverR = pix / 3
      val pix2OverR = pix * pixOverR
      math.sin(pix) * math.sin(pixOverR) / pix2OverR
    }

  /** `srcNd`/`hasSrcNd`: source-nodata masking (GDALWarpNoDataMasker,
    * `gdal/alg/gdalwarper.cpp:364`) — source pixels EQUAL to the nodata
    * value are excluded from kernel populations and weight sums rather
    * than contributing their numeric value. The unmasked path is
    * byte-identical to before (`hasSrcNd = false` short-circuits).
    */
  @inline private def sample(rows: Map[Int, Array[Double]], srcW: Int, srcH: Int,
                             px: Double, py: Double, kernel: Kernel,
                             noData: Double, xScale: Double = 1.0,
                             yScale: Double = 1.0, srcNd: Double = 0.0,
                             hasSrcNd: Boolean = false): Double = kernel match {
    case Nearest =>
      val ix = math.floor(px).toInt
      val iy = math.floor(py).toInt
      if (ix < 0 || ix >= srcW || iy < 0 || iy >= srcH) noData
      else {
        val v = rows.get(iy).map(_(ix)).getOrElse(noData)
        if (hasSrcNd && v == srcNd) noData else v
      }
    case Bilinear =>
      // sample at pixel centers: fractional position between centers
      val fx = px - 0.5
      val fy = py - 0.5
      val x0 = math.floor(fx).toInt
      val y0 = math.floor(fy).toInt
      val wx = fx - x0
      val wy = fy - y0
      if (fx < -1 || fx > srcW || fy < -1 || fy > srcH) noData
      else if (!hasSrcNd) {
        @inline def at(x: Int, y: Int): Double = {
          val cx = math.min(math.max(x, 0), srcW - 1)
          val cy = math.min(math.max(y, 0), srcH - 1)
          rows.get(cy).map(_(cx)).getOrElse(noData)
        }
        val v00 = at(x0, y0); val v10 = at(x0 + 1, y0)
        val v01 = at(x0, y0 + 1); val v11 = at(x0 + 1, y0 + 1)
        (v00 * (1 - wx) + v10 * wx) * (1 - wy) + (v01 * (1 - wx) + v11 * wx) * wy
      } else {
        // masked: accumulate valid samples only, renormalize by their
        // weight (GWKBilinearResample4Sample with a source validity mask)
        var acc = 0.0; var accW = 0.0
        @inline def add(x: Int, y: Int, w: Double): Unit =
          if (w > 0 && x >= 0 && x < srcW && y >= 0 && y < srcH) {
            val r = rows.getOrElse(y, null)
            if (r != null) {
              val v = r(x)
              if (v != srcNd) { acc += w * v; accW += w }
            }
          }
        add(x0, y0, (1 - wx) * (1 - wy)); add(x0 + 1, y0, wx * (1 - wy))
        add(x0, y0 + 1, (1 - wx) * wy); add(x0 + 1, y0 + 1, wx * wy)
        if (accW > 0.00001) acc / accW else noData
      }
    case Cubic =>
      val iSrcX = math.floor(px - 0.5).toInt
      val iSrcY = math.floor(py - 0.5).toInt
      if (iSrcX - 1 < 0 || iSrcX + 2 >= srcW || iSrcY - 1 < 0 || iSrcY + 2 >= srcH)
        sample(rows, srcW, srcH, px, py, Bilinear, noData, 1.0, 1.0, srcNd, hasSrcNd) // reference border fallback
      else if (hasSrcNd && {
        // GWKCubicResample4Sample: ANY invalid pixel in the 4×4 footprint
        // falls the whole sample back to masked bilinear
        var bad = false; var j = -1
        while (!bad && j <= 2) {
          val r = rows.getOrElse(iSrcY + j, null)
          if (r == null) bad = true
          else {
            var i = -1
            while (!bad && i <= 2) { if (r(iSrcX + i) == srcNd) bad = true; i += 1 }
          }
          j += 1
        }
        bad
      }) sample(rows, srcW, srcH, px, py, Bilinear, noData, 1.0, 1.0, srcNd, hasSrcNd)
      else {
        val dx = px - 0.5 - iSrcX; val dy = py - 0.5 - iSrcY
        val dx2 = dx * dx; val dx3 = dx2 * dx
        val dy2 = dy * dy; val dy3 = dy2 * dy
        @inline def rowConv(j: Int): Double = {
          val r = rows.getOrElse(iSrcY + j, null)
          if (r == null) return noData
          cubicConv(dx, dx2, dx3, r(iSrcX - 1), r(iSrcX), r(iSrcX + 1), r(iSrcX + 2))
        }
        cubicConv(dy, dy2, dy3, rowConv(-1), rowConv(0), rowConv(1), rowConv(2))
      }
    case CubicSpline => generalResample(rows, srcW, srcH, px, py, 2, bsplineW, noData, xScale, yScale, srcNd, hasSrcNd)
    case Lanczos     => generalResample(rows, srcW, srcH, px, py, 3, lanczosW, noData, xScale, yScale, srcNd, hasSrcNd)
    case _: RectKernel =>
      throw new IllegalStateException("rect kernels sample via sampleRect")
  }

  /** GWKResampleNoMasksT (`gdalwarpkernel.cpp:3161`): edge-clipped weight
    * window, result = Σ w·v / (ΣwH · ΣwV). `xScale`/`yScale` < 1 widen the
    * filter for downsampling (anti-aliasing), as the reference clamps
    * dfXScale to ≤ 1 and scales both the weight argument and the radius.
    */
  private[raster] def generalResample(rows: Map[Int, Array[Double]], srcW: Int, srcH: Int,
                                      px: Double, py: Double, radius: Int,
                                      weight: Double => Double, noData: Double,
                                      xScale: Double, yScale: Double,
                                      srcNd: Double = 0.0, hasSrcNd: Boolean = false): Double = {
    val iSrcX = math.floor(px - 0.5).toInt
    val iSrcY = math.floor(py - 0.5).toInt
    if (iSrcX >= srcW || iSrcY >= srcH || px < 0 || py < 0)
      return sample(rows, srcW, srcH, px, py, Bilinear, noData, 1.0, 1.0, srcNd, hasSrcNd)
    val dX = px - 0.5 - iSrcX
    val dY = py - 0.5 - iSrcY
    val xRadius = if (xScale < 1.0) math.ceil(radius / xScale).toInt else radius
    val yRadius = if (yScale < 1.0) math.ceil(radius / yScale).toInt else radius
    var iMin = 1 - xRadius
    if (iSrcX + iMin < 0) iMin = -iSrcX
    var iMax = xRadius
    if (iSrcX + iMax >= srcW - 1) iMax = srcW - 1 - iSrcX
    val w = new Array[Double](iMax - iMin + 1)
    var sumH = 0.0
    var i = iMin
    while (i <= iMax) {
      val wi = weight((i - dX) * xScale)
      w(i - iMin) = wi
      sumH += wi
      i += 1
    }
    var jMin = 1 - yRadius
    if (iSrcY + jMin < 0) jMin = -iSrcY
    var jMax = yRadius
    if (iSrcY + jMax >= srcH - 1) jMax = srcH - 1 - iSrcY
    if (!hasSrcNd) {
      var acc = 0.0
      var sumV = 0.0
      var j = jMin
      while (j <= jMax) {
        val r = rows.getOrElse(iSrcY + j, null)
        if (r == null) return noData
        var local = 0.0
        i = iMin
        while (i <= iMax) {
          local += r(iSrcX + i) * w(i - iMin)
          i += 1
        }
        val wj = weight((j - dY) * yScale)
        acc += wj * local
        sumV += wj
        j += 1
      }
      val denom = sumH * sumV
      if (denom == 0.0) noData else acc / denom
    } else {
      // masked GWKResample (`gdalwarpkernel.cpp:3012`): invalid pixels drop
      // out of both the accumulator and the weight sum; result normalizes
      // by the VALID weight only, nodata when nothing valid contributed
      var acc = 0.0
      var accW = 0.0
      var j = jMin
      while (j <= jMax) {
        val r = rows.getOrElse(iSrcY + j, null)
        if (r != null) {
          val wj = weight((j - dY) * yScale)
          i = iMin
          while (i <= iMax) {
            val v = r(iSrcX + i)
            if (v != srcNd) {
              val wij = wj * w(i - iMin)
              acc += wij * v
              accW += wij
            }
            i += 1
          }
        }
        j += 1
      }
      if (math.abs(accW) < 0.000001) noData else acc / accW
    }
  }

  /** Source-footprint aggregate of one dst pixel
    * (`gdalwarpkernel.cpp:4851-4880`: corner transforms with the 1e-10
    * guard, ordering swap, degenerate-rect widening; then per-kernel
    * accumulation over the rect).
    */
  private def sampleRect(rows: Map[Int, Array[Double]], srcW: Int, srcH: Int,
                         x1: Double, y1: Double, x2: Double, y2: Double,
                         kernel: RectKernel, noData: Double,
                         srcNd: Double = 0.0, hasSrcNd: Boolean = false): Double = {
    var xMin = math.max(math.floor(x1 + 1e-10).toInt, 0)
    var xMax = math.min(math.ceil(x2 - 1e-10).toInt, srcW)
    var yMin = math.max(math.floor(y1 + 1e-10).toInt, 0)
    var yMax = math.min(math.ceil(y2 - 1e-10).toInt, srcH)
    if (xMax < xMin) {
      xMin = math.max(math.floor(x2 + 1e-10).toInt, 0)
      xMax = math.min(math.ceil(x1 - 1e-10).toInt, srcW)
    }
    if (yMax < yMin) {
      yMin = math.max(math.floor(y2 + 1e-10).toInt, 0)
      yMax = math.min(math.ceil(y1 - 1e-10).toInt, srcH)
    }
    if (xMin == xMax && xMax < srcW) xMax += 1
    if (yMin == yMax && yMax < srcH) yMax += 1

    kernel match {
      case Average =>
        var total = 0.0; var n = 0
        var y = yMin
        while (y < yMax) {
          val r = rows.getOrElse(y, null)
          if (r != null) {
            var x = xMin
            while (x < xMax) {
              if (!hasSrcNd || r(x) != srcNd) { total += r(x); n += 1 }
              x += 1
            }
          }
          y += 1
        }
        if (n == 0) noData else total / n
      case Max =>
        var best = Double.MinValue; var n = 0
        var y = yMin
        while (y < yMax) {
          val r = rows.getOrElse(y, null)
          if (r != null) {
            var x = xMin
            while (x < xMax) {
              if (!hasSrcNd || r(x) != srcNd) { if (r(x) > best) best = r(x); n += 1 }
              x += 1
            }
          }
          y += 1
        }
        if (n == 0) noData else best
      case Min =>
        var best = Double.MaxValue; var n = 0
        var y = yMin
        while (y < yMax) {
          val r = rows.getOrElse(y, null)
          if (r != null) {
            var x = xMin
            while (x < xMax) {
              if (!hasSrcNd || r(x) != srcNd) { if (r(x) < best) best = r(x); n += 1 }
              x += 1
            }
          }
          y += 1
        }
        if (n == 0) noData else best
      case Mode =>
        // GWKAOM_Fmode: running first-encounter argmax over distinct values
        val vals = new scala.collection.mutable.ArrayBuffer[Double]()
        val sums = new scala.collection.mutable.ArrayBuffer[Int]()
        var maxIdx = -1
        var y = yMin
        while (y < yMax) {
          val r = rows.getOrElse(y, null)
          if (r != null) {
            var x = xMin
            while (x < xMax) {
              val v = r(x)
              if (hasSrcNd && v == srcNd) { x += 1 }
              else {
              var i = 0
              var found = false
              while (i < vals.length && !found) {
                if (vals(i) == v) {
                  sums(i) += 1
                  if (sums(i) > sums(maxIdx)) maxIdx = i
                  found = true
                }
                i += 1
              }
              if (!found) {
                vals += v; sums += 1
                if (maxIdx < 0) maxIdx = vals.length - 1
              }
              x += 1
              }
            }
          }
          y += 1
        }
        if (maxIdx < 0) noData else vals(maxIdx)
      case Quantile(q) =>
        val buf = new scala.collection.mutable.ArrayBuffer[Double]()
        var y = yMin
        while (y < yMax) {
          val r = rows.getOrElse(y, null)
          if (r != null) {
            var x = xMin
            while (x < xMax) {
              if (!hasSrcNd || r(x) != srcNd) buf += r(x)
              x += 1
            }
          }
          y += 1
        }
        if (buf.isEmpty) noData
        else {
          val sorted = buf.toArray
          java.util.Arrays.sort(sorted)
          sorted(math.ceil(q * sorted.length - 1).toInt)
        }
    }
  }

  final case class DstSpec(width: Int, height: Int, gt: GeoTransform, stripHeight: Int = 256)

  /** Warp src strips into the dst grid. */
  /** @param approxTol > 0 enables the approximate transformer for
    *        center-sampling kernels (Nearest/Bilinear/Cubic/CubicSpline/
    *        Lanczos): scanline coords linearly interpolated wherever the
    *        exact transform is locally linear within `approxTol` SOURCE
    *        pixels (gdalwarp `-et`; its default is 0.125). Rect kernels
    *        (Average/Mode/Min/…) always transform exactly.
    */
  def warp(spark: SparkSession, src: Dataset[DStrip], srcW: Int, srcH: Int,
           srcGt: GeoTransform, dst: DstSpec, tx: GeoTx = identityTx,
           kernel: Kernel = Nearest, noData: Double = 0.0,
           approxTol: Double = 0.0,
           srcNoData: Option[Double] = None): Dataset[DStrip] = {
    import spark.implicits._
    val srcInv = srcGt.inverse.getOrElse(sys.error("non-invertible src geotransform"))
    val nDst = (dst.height + dst.stripHeight - 1) / dst.stripHeight

    // driver-side: source row range per dst strip from outline samples
    // (covers the widest center-sampled kernel: Lanczos radius 3 widened
    // by the downsampling filter scale; rect kernels additionally sample
    // the outer pixel CORNERS below)
    val (xsM, ysM) = filterScales(dst, tx, srcInv)
    val margin = math.max(4, (if (ysM < 1.0) math.ceil(3 / ysM).toInt else 3) + 1)
    val ranges: Array[(Int, Int)] = Array.tabulate(nDst) { st =>
      val y0 = st * dst.stripHeight
      val y1 = math.min(dst.height, y0 + dst.stripHeight) - 1
      var lo = Double.MaxValue; var hi = -Double.MaxValue
      // 9 sampled rows per strip (not just ends+middle): strongly curved
      // pull transforms (RPC cubic line terms, TPS) can take their src-row
      // extremes at interior rows of a tall strip; under-covering silently
      // yields noData pixels. Driver cost is a few hundred transform
      // evaluations per strip — noise.
      val rowSamples = (0 to 8).map(k => y0 + (y1 - y0).toLong * k / 8).map(_.toInt).distinct
      for (dy <- rowSamples; dx <- 0 until dst.width by math.max(1, dst.width / 8)) {
        val (_, py) = srcPixelOf(dx, dy, dst.gt, tx, srcInv)
        if (py < lo) lo = py
        if (py > hi) hi = py
      }
      // right edge column + strip corner rows (rect-kernel footprints)
      for (dy <- Seq(y0, y1)) {
        val (_, py) = srcPixelOf(dst.width - 1, dy, dst.gt, tx, srcInv)
        if (py < lo) lo = py
        if (py > hi) hi = py
      }
      for (dy <- Seq(y0.toDouble, y1 + 1.0); dx <- Seq(0.0, dst.width / 2.0, dst.width.toDouble)) {
        val (_, py) = srcCornerOf(dx, dy, dst.gt, tx, srcInv)
        if (py < lo) lo = py
        if (py > hi) hi = py
      }
      (math.max(0, math.floor(lo).toInt - margin), math.min(srcH - 1, math.ceil(hi).toInt + margin))
    }
    val rangesB = spark.sparkContext.broadcast(ranges)

    // ship src rows to dst strips whose range covers them
    val rows = src.flatMap { s =>
      val rs = rangesB.value
      val out = Seq.newBuilder[(Int, Int, Array[Double])]
      var st = 0
      while (st < rs.length) {
        val (lo, hi) = rs(st)
        var sy = math.max(lo, s.yOff)
        val end = math.min(hi, s.yOff + s.height - 1)
        while (sy <= end) {
          out += ((st, sy, java.util.Arrays.copyOfRange(s.vals, (sy - s.yOff) * srcW, (sy - s.yOff + 1) * srcW)))
          sy += 1
        }
        st += 1
      }
      out.result().iterator
    }

    // sentinel per dst strip so fully-outside strips still emit (as nodata)
    val sentinels = spark.range(nDst).map(st => (st.toInt, -1, Array.empty[Double]))
    val dstW = dst.width; val dstH = dst.height; val stripH = dst.stripHeight
    val dstGt = dst.gt; val k = kernel; val nd = noData
    val (xs, ys) = filterScales(dst, tx, srcInv)
    val aTol = approxTol
    val snd = srcNoData.getOrElse(0.0); val hasSnd = srcNoData.isDefined
    rows.union(sentinels).groupByKey(_._1).mapGroups { (st, it) =>
      val srcRows: Map[Int, Array[Double]] = it.filter(_._2 >= 0).map(t => t._2 -> t._3).toMap
      val y0 = st * stripH
      val hh = math.min(stripH, dstH - y0)
      val out = new Array[Double](hh * dstW)
      val useApprox = aTol > 0 && !k.isInstanceOf[RectKernel]
      var r = 0
      while (r < hh) {
        if (useApprox) {
          val (axs, ays) = approxRow(dstW, y0 + r, dstGt, tx, srcInv, aTol)
          var c = 0
          while (c < dstW) {
            out(r * dstW + c) = sample(srcRows, srcW, srcH, axs(c), ays(c), k, nd, xs, ys, snd, hasSnd)
            c += 1
          }
        } else {
          var c = 0
          while (c < dstW) {
            out(r * dstW + c) = samplePixel(srcRows, srcW, srcH, c, y0 + r, dstGt, tx, srcInv, k, nd, xs, ys, snd, hasSnd)
            c += 1
          }
        }
        r += 1
      }
      DStrip(st, y0, hh, out)
    }
  }

  /** Filter scale = dst samples per src pixel, clamped to ≤ 1 (the
    * reference's dfXScale/dfYScale), estimated from adjacent dst pixel
    * centers at the grid middle — exact for affine pairs, a good local
    * estimate for curved transforms.
    */
  private def filterScales(dst: DstSpec, tx: GeoTx, srcInv: GeoTransform): (Double, Double) = {
    val cx = dst.width / 2; val cy = dst.height / 2
    val (px0, py0) = srcPixelOf(cx, cy, dst.gt, tx, srcInv)
    val (px1, _) = srcPixelOf(cx + 1, cy, dst.gt, tx, srcInv)
    val (_, py1) = srcPixelOf(cx, cy + 1, dst.gt, tx, srcInv)
    val kx = math.abs(px1 - px0) // src pixels per dst step in x
    val ky = math.abs(py1 - py0)
    (if (kx > 1.0) 1.0 / kx else 1.0, if (ky > 1.0) 1.0 / ky else 1.0)
  }

  /** Single-node reference for tests. */
  def warpLocal(vals: Array[Double], srcW: Int, srcH: Int, srcGt: GeoTransform,
                dst: DstSpec, tx: GeoTx = identityTx, kernel: Kernel = Nearest,
                noData: Double = 0.0,
                srcNoData: Option[Double] = None): Array[Double] = {
    val srcInv = srcGt.inverse.get
    val rows: Map[Int, Array[Double]] = (0 until srcH).map(y =>
      y -> java.util.Arrays.copyOfRange(vals, y * srcW, (y + 1) * srcW)).toMap
    val out = new Array[Double](dst.width * dst.height)
    val (xs, ys) = filterScales(dst, tx, srcInv)
    val snd = srcNoData.getOrElse(0.0); val hasSnd = srcNoData.isDefined
    for (y <- 0 until dst.height; x <- 0 until dst.width)
      out(y * dst.width + x) = samplePixel(rows, srcW, srcH, x, y, dst.gt, tx, srcInv, kernel, noData, xs, ys, snd, hasSnd)
    out
  }
}
