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

  /** Continuous src pixel coords of a dst pixel center. */
  @inline private def srcPixelOf(dx: Int, dy: Int, dstGt: GeoTransform,
                                 tx: GeoTx, srcInv: GeoTransform): (Double, Double) = {
    val gx = dstGt.geoX(dx + 0.5, dy + 0.5)
    val gy = dstGt.geoY(dx + 0.5, dy + 0.5)
    val (sx, sy) = tx(gx, gy)
    (srcInv.geoX(sx, sy), srcInv.geoY(sx, sy))
  }

  @inline private def sample(rows: Map[Int, Array[Double]], srcW: Int, srcH: Int,
                             px: Double, py: Double, kernel: Kernel,
                             noData: Double): Double = kernel match {
    case Nearest =>
      val ix = math.floor(px).toInt
      val iy = math.floor(py).toInt
      if (ix < 0 || ix >= srcW || iy < 0 || iy >= srcH) noData
      else rows.get(iy).map(_(ix)).getOrElse(noData)
    case Bilinear =>
      // sample at pixel centers: fractional position between centers
      val fx = px - 0.5
      val fy = py - 0.5
      val x0 = math.floor(fx).toInt
      val y0 = math.floor(fy).toInt
      val wx = fx - x0
      val wy = fy - y0
      @inline def at(x: Int, y: Int): Double = {
        val cx = math.min(math.max(x, 0), srcW - 1)
        val cy = math.min(math.max(y, 0), srcH - 1)
        rows.get(cy).map(_(cx)).getOrElse(noData)
      }
      if (fx < -1 || fx > srcW || fy < -1 || fy > srcH) noData
      else {
        val v00 = at(x0, y0); val v10 = at(x0 + 1, y0)
        val v01 = at(x0, y0 + 1); val v11 = at(x0 + 1, y0 + 1)
        (v00 * (1 - wx) + v10 * wx) * (1 - wy) + (v01 * (1 - wx) + v11 * wx) * wy
      }
  }

  final case class DstSpec(width: Int, height: Int, gt: GeoTransform, stripHeight: Int = 256)

  /** Warp src strips into the dst grid. */
  def warp(spark: SparkSession, src: Dataset[DStrip], srcW: Int, srcH: Int,
           srcGt: GeoTransform, dst: DstSpec, tx: GeoTx = identityTx,
           kernel: Kernel = Nearest, noData: Double = 0.0): Dataset[DStrip] = {
    import spark.implicits._
    val srcInv = srcGt.inverse.getOrElse(sys.error("non-invertible src geotransform"))
    val nDst = (dst.height + dst.stripHeight - 1) / dst.stripHeight

    // driver-side: source row range per dst strip from outline samples
    val margin = 2
    val ranges: Array[(Int, Int)] = Array.tabulate(nDst) { st =>
      val y0 = st * dst.stripHeight
      val y1 = math.min(dst.height, y0 + dst.stripHeight) - 1
      var lo = Double.MaxValue; var hi = -Double.MaxValue
      for (dy <- Seq(y0, (y0 + y1) / 2, y1); dx <- 0 until dst.width by math.max(1, dst.width / 8)) {
        val (_, py) = srcPixelOf(dx, dy, dst.gt, tx, srcInv)
        if (py < lo) lo = py
        if (py > hi) hi = py
      }
      // right edge column too
      for (dy <- Seq(y0, y1)) {
        val (_, py) = srcPixelOf(dst.width - 1, dy, dst.gt, tx, srcInv)
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
    rows.union(sentinels).groupByKey(_._1).mapGroups { (st, it) =>
      val srcRows: Map[Int, Array[Double]] = it.filter(_._2 >= 0).map(t => t._2 -> t._3).toMap
      val y0 = st * stripH
      val hh = math.min(stripH, dstH - y0)
      val out = new Array[Double](hh * dstW)
      var r = 0
      while (r < hh) {
        var c = 0
        while (c < dstW) {
          val (px, py) = srcPixelOf(c, y0 + r, dstGt, tx, srcInv)
          out(r * dstW + c) = sample(srcRows, srcW, srcH, px, py, k, nd)
          c += 1
        }
        r += 1
      }
      DStrip(st, y0, hh, out)
    }
  }

  /** Single-node reference for tests. */
  def warpLocal(vals: Array[Double], srcW: Int, srcH: Int, srcGt: GeoTransform,
                dst: DstSpec, tx: GeoTx = identityTx, kernel: Kernel = Nearest,
                noData: Double = 0.0): Array[Double] = {
    val srcInv = srcGt.inverse.get
    val rows: Map[Int, Array[Double]] = (0 until srcH).map(y =>
      y -> java.util.Arrays.copyOfRange(vals, y * srcW, (y + 1) * srcW)).toMap
    val out = new Array[Double](dst.width * dst.height)
    for (y <- 0 until dst.height; x <- 0 until dst.width) {
      val (px, py) = srcPixelOf(x, y, dst.gt, tx, srcInv)
      out(y * dst.width + x) = sample(rows, srcW, srcH, px, py, kernel, noData)
    }
    out
  }
}
