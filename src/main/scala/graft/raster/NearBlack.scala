package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}

/** Collar removal — `nearblack` (`/root/reference/gdal/apps/
  * nearblack_lib.cpp`): pixels within `nearDist` of a collar color
  * (black/white/custom list) are smashed to the exact color, scanning
  * inward from every edge until `maxNonBlack` non-collar pixels have been
  * crossed. Exact port of ProcessLine (`nearblack_lib.cpp:506`): top-down
  * pass (vertical saturating counts + L→R and R→L horizontal runs), then a
  * bottom-up pass over the first pass's OUTPUT with counts reset and the
  * horizontal tolerance pinned to 0, including the reference's quirks
  * (`i != iEnd` leaves the final pixel of each horizontal run untouched;
  * non-collar pixels inside the tolerance are smashed too; vertical counts
  * never reset).
  *
  * Distribution: the only cross-strip state is panLastLineCounts — and
  * because a column's count saturates at maxNonBlack+1 and never resets,
  * the state entering strip k is simply `min(Σ_{i<k} F_i, max+1)` where
  * F_i = that column's non-collar pixel count in strip i (clamped). Each
  * pass is then: one flatMap for per-strip column summaries, a per-column
  * clamped prefix sum (shuffle on column, chains are nStrips long), a
  * regroup to per-strip incoming-count vectors, and an exact per-strip
  * replay — no driver state at any width.
  */
object NearBlack extends Serializable {

  /** Multi-band integer strip: bands(b)(r*w + c). */
  final case class NBStrip(stripIdx: Int, yOff: Int, height: Int,
                           bands: Array[Array[Int]])

  final case class Opts(nearDist: Int = 15, maxNonBlack: Int = 2,
                        nearWhite: Boolean = false,
                        colors: Seq[Array[Int]] = Nil) {
    def replaceValue: Int = if (nearWhite) 255 else 0
    def colorList(nBands: Int): Array[Array[Int]] =
      if (colors.nonEmpty) colors.map { c =>
        require(c.length == nBands, s"color arity ${c.length} != bands $nBands"); c
      }.toArray
      else Array(Array.fill(nBands)(replaceValue))
  }

  /** Pixel is NON-collar iff it matches no color within nearDist on every
    * band (`nearblack_lib.cpp:545-567`).
    */
  @inline private def isNonBlack(bands: Array[Array[Int]], idx: Int,
                                 colors: Array[Array[Int]], dist: Int): Boolean = {
    var iColor = 0
    while (iColor < colors.length) {
      val col = colors(iColor)
      var non = false
      var b = 0
      while (!non && b < bands.length) {
        val pix = bands(b)(idx)
        if (col(b) - pix > dist || pix > dist + col(b)) non = true
        b += 1
      }
      if (!non) return false // matched this color → collar pixel
      iColor += 1
    }
    true
  }

  /** One ProcessLine invocation (vertical + one horizontal direction). */
  private def processLine(bands: Array[Array[Int]], rowOff: Int, w: Int,
                          counts: Array[Int], opts: Opts,
                          colors: Array[Array[Int]],
                          iStart: Int, iEnd: Int,
                          doVertical: Boolean, bottomUp: Boolean): Unit = {
    val dist = opts.nearDist
    val repl = opts.replaceValue
    val maxNB = opts.maxNonBlack
    if (doVertical) {
      var i = 0
      while (i < w) {
        if (counts(i) <= maxNB) {
          val non = isNonBlack(bands, rowOff + i, colors, dist)
          var skip = false
          if (non) {
            counts(i) += 1
            if (counts(i) > maxNB) skip = true
          }
          if (!skip) {
            var b = 0
            while (b < bands.length) { bands(b)(rowOff + i) = repl; b += 1 }
          }
        }
        i += 1
      }
    }
    // horizontal: the reference loop runs i != iEnd, leaving iEnd untouched
    val hMax = if (bottomUp) 0 else maxNB
    var nNonBlack = 0
    var doTest = true
    val dir = if (iStart < iEnd) 1 else -1
    var i = iStart
    while (i != iEnd) {
      if (doTest) {
        val non = isNonBlack(bands, rowOff + i, colors, dist)
        if (non) {
          if (counts(i) <= hMax) nNonBlack = counts(i)
          else nNonBlack += 1
        }
        if (nNonBlack > hMax) doTest = false
        else {
          var b = 0
          while (b < bands.length) { bands(b)(rowOff + i) = repl; b += 1 }
        }
      } else if (counts(i) == 0) {
        doTest = true
        nNonBlack = 0
      }
      i += dir
    }
  }

  /** Replay one pass over a strip IN PLACE, given the per-column counts
    * entering the strip (mutated to the exiting counts).
    */
  private def processStrip(bands: Array[Array[Int]], w: Int, height: Int,
                           counts: Array[Int], opts: Opts,
                           colors: Array[Array[Int]], bottomUp: Boolean): Unit = {
    val rows = if (bottomUp) (height - 1) to 0 by -1 else 0 until height
    rows.foreach { r =>
      processLine(bands, r * w, w, counts, opts, colors, iStart = 0, iEnd = w - 1,
        doVertical = true, bottomUp = bottomUp)
      processLine(bands, r * w, w, counts, opts, colors, iStart = w - 1, iEnd = 0,
        doVertical = false, bottomUp = bottomUp)
    }
  }

  /** Exact single-node port (both passes), for tests and tiny rasters. */
  def local(bands0: Array[Array[Int]], w: Int, h: Int, opts: Opts = Opts()): Array[Array[Int]] = {
    val bands = bands0.map(_.clone())
    val colors = opts.colorList(bands.length)
    processStrip(bands, w, h, new Array[Int](w), opts, colors, bottomUp = false)
    processStrip(bands, w, h, new Array[Int](w), opts, colors, bottomUp = true)
    bands
  }

  /** Distributed nearblack over strips (both passes). */
  def apply(spark: SparkSession, strips: Dataset[NBStrip], w: Int, h: Int,
            opts: Opts = Opts()): Dataset[NBStrip] = {
    import spark.implicits._
    val nStrips = strips.map(_.stripIdx).reduce(math.max) + 1
    val afterDown = pass(spark, strips, w, nStrips, opts, bottomUp = false)
    pass(spark, afterDown, w, nStrips, opts, bottomUp = true)
  }

  /** One pass: per-column clamped prefix sums of non-collar counts feed an
    * exact per-strip replay.
    */
  private def pass(spark: SparkSession, stripsIn: Dataset[NBStrip], w: Int,
                   nStrips: Int, opts: Opts, bottomUp: Boolean): Dataset[NBStrip] = {
    import spark.implicits._
    val strips = stripsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val optsV = opts
    val cap = opts.maxNonBlack + 1
    val bu = bottomUp

    // per-strip per-column clamped non-collar counts (from pristine pass
    // input — vertical tests never see same-pass mutations of OTHER rows)
    val sums = strips.flatMap { s =>
      val colors = optsV.colorList(s.bands.length)
      val f = new Array[Int](w)
      var r = 0
      while (r < s.height) {
        var c = 0
        while (c < w) {
          if (f(c) < cap && isNonBlack(s.bands, r * w + c, colors, optsV.nearDist))
            f(c) += 1
          c += 1
        }
        r += 1
      }
      (0 until w).iterator.filter(f(_) > 0).map(c => (c, s.stripIdx, f(c)))
    }

    // per-column clamped prefix sum in pass order → counts ENTERING each
    // strip. Walk EVERY strip index in pass order (not just strips with a
    // nonzero contribution in this column): once a column has accumulated
    // count it must reach all later strips, including those whose own
    // pixels are all collar-valued — the reference's counts never reset.
    val nStripsV = nStrips
    val incoming = sums.groupByKey(_._1).flatMapGroups { (c, it) =>
      val fByStrip = it.map(t => (t._2, t._3)).toMap
      val order = if (bu) (nStripsV - 1) to 0 by -1 else 0 until nStripsV
      var acc = 0
      val out = Vector.newBuilder[(Int, Int, Int)] // (stripIdx, col, incoming)
      order.foreach { st =>
        if (acc > 0) out += ((st, c, acc))
        acc = math.min(cap, acc + fByStrip.getOrElse(st, 0))
      }
      out.result().iterator
    }

    val res = strips.groupByKey(_.stripIdx)
      .cogroup(incoming.groupByKey(_._1)) { (_, sIt, cIt) =>
        val counts = new Array[Int](w)
        cIt.foreach { case (_, col, v) => counts(col) = v }
        sIt.map { s =>
          val bands = s.bands.map(_.clone())
          val colors = optsV.colorList(bands.length)
          processStrip(bands, w, s.height, counts, optsV, colors, bottomUp = bu)
          NBStrip(s.stripIdx, s.yOff, s.height, bands)
        }
      }
    // materialize, then release the pass-input cache (two full raster
    // copies would otherwise stay pinned per apply() call)
    val out = graft.core.Ckpt(res)
    strips.unpersist(false)
    out
  }
}
