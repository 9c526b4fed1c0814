package graft.raster

import graft.core.{GLine, GeoTransform}
import scala.collection.mutable

/** Contour generation — iso-lines from a raster
  * (`/root/reference/gdal/alg/contour.cpp:1543` GDALContourGenerate):
  * marching squares over pixel-center samples with linear interpolation,
  * value fudging for samples exactly on a level (`contour.cpp:38` comment:
  * nudge by a fraction of the interval), and segment stitching into
  * polylines. Fixture gate: the concentric-plateau case of
  * `autotest/alg/contour.py:43-129` (2 features, envelope parity within
  * half a pixel).
  *
  * Distribution note: the marching-squares cell pass is strip-parallel
  * (same halo-row pattern as [[Dem.apply3x3]]); chains stitch per strip
  * and merge across strips by shared endpoints — the same groupBy-and-
  * coalesce layout as [[RasterStrips.polygonize]] Phase D. The local
  * kernel below is the per-strip unit.
  */
object Contour {

  private final val Fudge = 1e-5 // fraction of interval to nudge exact hits

  /** Generate contour polylines for the given levels.
    * Samples are at pixel centers; output coordinates in geo space.
    */
  def contourLines(vals: Array[Double], w: Int, h: Int, gt: GeoTransform,
                   levels: Seq[Double], interval: Double = 0.0): Map[Double, Seq[GLine]] = {
    val fudgeAmt = (if (interval > 0) interval else 1.0) * Fudge
    levels.map { level =>
      @inline def v(x: Int, y: Int): Double = {
        val raw = vals(y * w + x)
        if (raw == level) raw + fudgeAmt else raw
      }
      // segments in pixel-center space
      val segs = mutable.ArrayBuffer[(Double, Double, Double, Double)]()
      var cy = 0
      while (cy < h - 1) {
        var cx = 0
        while (cx < w - 1) {
          // cell corners: (cx,cy) (cx+1,cy) (cx,cy+1) (cx+1,cy+1)
          val v00 = v(cx, cy); val v10 = v(cx + 1, cy)
          val v01 = v(cx, cy + 1); val v11 = v(cx + 1, cy + 1)
          var code = 0
          if (v00 > level) code |= 1
          if (v10 > level) code |= 2
          if (v01 > level) code |= 4
          if (v11 > level) code |= 8
          if (code != 0 && code != 15) {
            @inline def interp(va: Double, vb: Double): Double = (level - va) / (vb - va)
            // edge crossing points (pixel-center coords)
            def top = (cx + 0.5 + interp(v00, v10), cy + 0.5)
            def bottom = (cx + 0.5 + interp(v01, v11), cy + 1.5)
            def left = (cx + 0.5, cy + 0.5 + interp(v00, v01))
            def right = (cx + 1.5, cy + 0.5 + interp(v10, v11))
            def add(a: (Double, Double), b: (Double, Double)): Unit =
              segs += ((a._1, a._2, b._1, b._2))
            code match {
              case 1 | 14 => add(left, top)
              case 2 | 13 => add(top, right)
              case 3 | 12 => add(left, right)
              case 4 | 11 => add(bottom, left)
              case 5 | 10 => add(top, bottom)
              case 7 | 8  => add(right, bottom)
              case 6 | 9  => // saddle (TR+BL or TL+BR above): center decides
                val connectAbove = (v00 + v10 + v01 + v11) / 4 > level
                if (code == 6) {
                  if (connectAbove) { add(left, top); add(right, bottom) }
                  else { add(top, right); add(bottom, left) }
                } else {
                  if (connectAbove) { add(top, right); add(left, bottom) }
                  else { add(left, top); add(right, bottom) }
                }
              case _ =>
            }
          }
          cx += 1
        }
        cy += 1
      }
      // stitch segments into chains by exact endpoint matching
      level -> stitch(segs.toSeq).map { chain =>
        val xy = new Array[Double](chain.length * 2)
        chain.zipWithIndex.foreach { case ((px, py), i) =>
          xy(2 * i) = gt.geoX(px, py)
          xy(2 * i + 1) = gt.geoY(px, py)
        }
        GLine(xy)
      }
    }.toMap
  }

  /** Join segments sharing endpoints into maximal polylines. */
  private def stitch(segs: Seq[(Double, Double, Double, Double)]): Seq[Vector[(Double, Double)]] = {
    type P = (Double, Double)
    val chains = mutable.ArrayBuffer[mutable.ArrayDeque[P]]()
    val byEnd = mutable.HashMap[P, Int]() // endpoint -> chain index
    def endpoints(c: mutable.ArrayDeque[P]): (P, P) = (c.head, c.last)
    segs.foreach { case (x1, y1, x2, y2) =>
      val a: P = (x1, y1); val b: P = (x2, y2)
      (byEnd.get(a), byEnd.get(b)) match {
        case (Some(i), Some(j)) if i != j =>
          // join two chains
          val ci = chains(i); val cj = chains(j)
          byEnd.remove(ci.head); byEnd.remove(ci.last)
          byEnd.remove(cj.head); byEnd.remove(cj.last)
          val joinedI = if (ci.head == a) ci.reverse else ci
          val joinedJ = if (cj.last == b) cj.reverse else cj
          val merged = joinedI ++ joinedJ
          chains(i) = merged
          chains(j) = mutable.ArrayDeque.empty
          byEnd(merged.head) = i; byEnd(merged.last) = i
        case (Some(i), Some(_)) => // same chain: closes a ring
          val ci = chains(i)
          byEnd.remove(ci.head); byEnd.remove(ci.last)
          ci.append(if (ci.last == a) b else a)
        case (Some(i), None) =>
          val ci = chains(i)
          byEnd.remove(ci.head); byEnd.remove(ci.last)
          if (ci.last == a) ci.append(b) else ci.prepend(b)
          byEnd(ci.head) = i; byEnd(ci.last) = i
        case (None, Some(j)) =>
          val cj = chains(j)
          byEnd.remove(cj.head); byEnd.remove(cj.last)
          if (cj.last == b) cj.append(a) else cj.prepend(a)
          byEnd(cj.head) = j; byEnd(cj.last) = j
        case (None, None) =>
          val c = mutable.ArrayDeque(a, b)
          chains += c
          byEnd(a) = chains.length - 1
          byEnd(b) = chains.length - 1
      }
    }
    chains.filter(_.nonEmpty).map(_.toVector).toSeq
  }
}
