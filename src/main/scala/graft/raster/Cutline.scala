package graft.raster

import org.apache.spark.sql.Dataset
import graft.core.{GLine, GMulti, GPolygon, Geom, GeomOps, GPoint, GeoTransform}
import graft.raster.Dem.DStrip

/** Warp cutline masking — `gdalwarp -cutline / -crop_to_cutline / -cblend`
  * (`/root/reference/gdal/apps/gdalwarp_lib.cpp:192` LoadCutline;
  * GDALWarpCutlineMaskerEx in `gdal/alg/gdalwarper.cpp`): the destination
  * is clipped to a polygon. The reference rasterizes the cutline into a
  * per-chunk validity mask with the pixel-center rule; here the chunk IS
  * the dst strip and the mask burns with the same scanline kernel as
  * [[Rasterize]] — nothing leaves the executor.
  *
  * Cutline coordinates are in the DESTINATION georeferenced space
  * (pre-transform with st_transform when the polygon lives in another CRS,
  * where the reference does the OGR coordinate transformation at load).
  *
  * Blending (`-cblend N`, N in dst pixels): density ramps linearly across
  * the cutline over ±N pixels — 1 at ≥N inside, 0 at ≥N outside, 0.5 on
  * the line. The reference blends src against EXISTING dst content; a
  * standalone warp output has only its nodata fill, so here the blend is
  * against the `noData` fill VALUE (equivalent to mosaicking onto a dst
  * initialized to that value — the classic feathered-mosaic use).
  */
object Cutline extends Serializable {

  /** Clip warped dst strips to the cutline.
    *
    * @param blendPx 0 = hard pixel-center mask; > 0 = density feather over
    *                ±blendPx dst pixels around the cutline boundary
    */
  def apply(strips: Dataset[DStrip], dst: Warp.DstSpec, cutline: Geom,
            noData: Double, blendPx: Double = 0.0): Dataset[DStrip] = {
    import strips.sparkSession.implicits._
    val w = dst.width
    val gt = dst.gt
    val pxSize = math.min(math.abs(gt.gt1), math.abs(gt.gt5))
    val blendGeo = blendPx * pxSize
    // boundary segments once on the driver (tiny vs raster), shipped in the
    // closure; per strip only the segments within blend reach participate
    val segs: Array[(Double, Double, Double, Double)] =
      if (blendPx > 0) boundarySegments(cutline) else Array.empty
    strips.map { st =>
      val chunk = new Rasterize.ByteChunk(w, st.height, 1)
      Rasterize.burnShapeByte(chunk, st.yOff, gt,
        Rasterize.Shape(cutline, Array(1.0)), Rasterize.Options())
      val out = st.vals.clone()
      // strip geo bbox expanded by the blend reach → local segments
      val local: Array[(Double, Double, Double, Double)] =
        if (blendPx <= 0) Array.empty
        else {
          val corners = Seq((0.0, st.yOff.toDouble), (w.toDouble, st.yOff.toDouble),
            (0.0, (st.yOff + st.height).toDouble), (w.toDouble, (st.yOff + st.height).toDouble))
            .map { case (px, py) => (gt.geoX(px, py), gt.geoY(px, py)) }
          val bx0 = corners.map(_._1).min - blendGeo; val bx1 = corners.map(_._1).max + blendGeo
          val by0 = corners.map(_._2).min - blendGeo; val by1 = corners.map(_._2).max + blendGeo
          segs.filter { case (x1, y1, x2, y2) =>
            math.max(x1, x2) >= bx0 && math.min(x1, x2) <= bx1 &&
            math.max(y1, y2) >= by0 && math.min(y1, y2) <= by1 }
        }
      var r = 0
      while (r < st.height) {
        var c = 0
        while (c < w) {
          val inside = chunk.data(r * w + c) != 0
          if (blendPx <= 0) {
            if (!inside) out(r * w + c) = noData
          } else {
            val gx = gt.geoX(c + 0.5, st.yOff + r + 0.5)
            val gy = gt.geoY(c + 0.5, st.yOff + r + 0.5)
            var d2 = Double.MaxValue
            var i = 0
            while (i < local.length) {
              val s = local(i)
              d2 = math.min(d2, segDistSq(gx, gy, s._1, s._2, s._3, s._4))
              i += 1
            }
            val dist = if (local.isEmpty) Double.MaxValue else math.sqrt(d2) / pxSize
            val density =
              if (inside) math.min(1.0, 0.5 + dist / (2.0 * blendPx))
              else math.max(0.0, 0.5 - dist / (2.0 * blendPx))
            out(r * w + c) =
              if (density <= 0.0) noData
              else if (density >= 1.0) out(r * w + c)
              else out(r * w + c) * density + noData * (1.0 - density)
          }
          c += 1
        }
        r += 1
      }
      DStrip(st.stripIdx, st.yOff, st.height, out)
    }
  }

  /** `-crop_to_cutline -tr pxW pxH`: dst grid covering the cutline
    * envelope, origin/extent snapped OUTWARD to the resolution grid (the
    * reference aligns the cropped window to the target resolution).
    */
  def cropToCutline(cutline: Geom, pxW: Double, pxH: Double,
                    stripHeight: Int = 256): Warp.DstSpec = {
    val env = cutline.envelope
    val xmin = math.floor(env.minX / pxW) * pxW
    val xmax = math.ceil(env.maxX / pxW) * pxW
    val ymin = math.floor(env.minY / pxH) * pxH
    val ymax = math.ceil(env.maxY / pxH) * pxH
    val width = math.max(1, math.round((xmax - xmin) / pxW).toInt)
    val height = math.max(1, math.round((ymax - ymin) / pxH).toInt)
    Warp.DstSpec(width, height, GeoTransform.northUp(xmin, ymax, pxW, pxH), stripHeight)
  }

  /** All boundary segments of the polygon(s), outer rings and holes. */
  private def boundarySegments(g: Geom): Array[(Double, Double, Double, Double)] = {
    val out = Array.newBuilder[(Double, Double, Double, Double)]
    def walk(geom: Geom): Unit = geom match {
      case p: GPolygon =>
        p.rings.foreach { ring =>
          val n = ring.xy.length / 2
          var i = 0
          while (i + 1 < n) {
            out += ((ring.xy(2 * i), ring.xy(2 * i + 1),
                     ring.xy(2 * i + 2), ring.xy(2 * i + 3)))
            i += 1
          }
        }
      case m: GMulti => m.geoms.foreach(walk)
      case l: GLine =>
        val n = l.numPoints
        var i = 0
        while (i + 1 < n) { out += ((l.x(i), l.y(i), l.x(i + 1), l.y(i + 1))); i += 1 }
      case _: GPoint => ()
    }
    walk(g)
    out.result()
  }

  /** Squared distance from (px,py) to segment (x1,y1)-(x2,y2). */
  @inline private def segDistSq(px: Double, py: Double, x1: Double, y1: Double,
                                x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0.0) 0.0
            else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / len2))
    val cx = x1 + t * dx; val cy = y1 + t * dy
    (px - cx) * (px - cx) + (py - cy) * (py - cy)
  }
}
