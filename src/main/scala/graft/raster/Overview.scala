package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}

/** Overview (pyramid) generation — 2× downsampling re-expressing
  * `/root/reference/gdal/gcore/overview.cpp:2261` GDALRegenerateOverviews:
  *  - AVERAGE: integer fast path `(total + 2) / 4` for full 2×2 blocks
  *    (`overview.cpp:355`), `total / count` truncation on partial edge
  *    blocks (`:392`)
  *  - NEAREST: top-left pixel of each block
  *  - MODE: most frequent value, ties to the first encountered scan-order
  *    value
  *
  * Distribution: requires strips aligned to even y (stripHeight % 2 == 0
  * except the last) so every 2×2 block lives inside one strip — each level
  * is then an embarrassingly-parallel map, and L levels chain maps with no
  * shuffle at all.
  */
object Overview {

  final case class IStrip(stripIdx: Int, yOff: Int, height: Int, width: Int, vals: Array[Int])

  sealed trait Resampler
  case object Average extends Resampler
  case object Nearest extends Resampler
  case object Mode extends Resampler

  /** Downsample one strip 2× (both axes). yOff must be even. */
  def downsampleStrip(s: IStrip, r: Resampler): IStrip = {
    require(s.yOff % 2 == 0, s"strip yOff ${s.yOff} not 2-aligned")
    val w = s.width
    val ow = (w + 1) / 2
    val oh = (s.height + 1) / 2
    val out = new Array[Int](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        val x0 = ox * 2; val y0 = oy * 2
        val hasX1 = x0 + 1 < w
        val hasY1 = y0 + 1 < s.height
        val v: Int = r match {
          case Nearest => s.vals(y0 * w + x0)
          case Average =>
            if (hasX1 && hasY1) {
              val total = s.vals(y0 * w + x0) + s.vals(y0 * w + x0 + 1) +
                s.vals((y0 + 1) * w + x0) + s.vals((y0 + 1) * w + x0 + 1)
              (total + 2) / 4
            } else {
              var total = 0; var count = 0
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  if (x0 + dx < w && y0 + dy < s.height) {
                    total += s.vals((y0 + dy) * w + x0 + dx); count += 1
                  }
                  dx += 1
                }
                dy += 1
              }
              total / count
            }
          case Mode =>
            val cand = new scala.collection.mutable.LinkedHashMap[Int, Int]
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                if (x0 + dx < w && y0 + dy < s.height) {
                  val p = s.vals((y0 + dy) * w + x0 + dx)
                  cand(p) = cand.getOrElse(p, 0) + 1
                }
                dx += 1
              }
              dy += 1
            }
            cand.maxBy(_._2)._1
        }
        out(oy * ow + ox) = v
        ox += 1
      }
      oy += 1
    }
    IStrip(s.stripIdx, s.yOff / 2, oh, ow, out)
  }

  /** One pyramid level over a strip Dataset (shuffle-free map). */
  def level(strips: Dataset[IStrip], r: Resampler): Dataset[IStrip] = {
    import strips.sparkSession.implicits._
    strips.map(downsampleStrip(_, r))
  }

  /** Full pyramid: returns levels 1..n (level 0 = input). */
  def pyramid(strips: Dataset[IStrip], nLevels: Int, r: Resampler): Seq[Dataset[IStrip]] = {
    var cur = strips
    (1 to nLevels).map { _ =>
      cur = level(cur, r)
      cur
    }
  }

  /** Single-node reference for tests. */
  def downsampleLocal(vals: Array[Int], w: Int, h: Int, r: Resampler): (Array[Int], Int, Int) = {
    val s = downsampleStrip(IStrip(0, 0, h, w, vals), r)
    (s.vals, s.width, s.height)
  }
}
