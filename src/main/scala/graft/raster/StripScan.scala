package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed per-column prefix/suffix scan across raster strips.
  *
  * The vertical phases of the separable EDT (proximity) and of fill-nodata
  * need, per strip and column, the combined state of all strips strictly
  * ABOVE (prefix) and strictly BELOW (suffix) — a "latest non-absent value
  * wins" scan in strip order. Doing that on the driver costs
  * O(strips × width) driver memory plus an equally large broadcast.
  *
  * Here the scan is a two-shuffle plan that never touches the driver:
  *   1. each strip's per-column payload splits into column blocks
  *      (block index is the shuffle key);
  *   2. each block group sorts its O(strips) slices by stripIdx and runs
  *      the prefix and suffix scans locally (per-task memory =
  *      nStrips × blockW longs, sized to a fixed budget);
  *   3. the per-strip incoming slices shuffle back on stripIdx and
  *      reassemble into full-width arrays.
  *
  * Payloads are caller-packed Longs ([[Absent]] = no value in that column
  * of that strip); `down` propagates to later strips (prefix source),
  * `up` to earlier strips (suffix source).
  */
object StripScan {

  val Absent: Long = Long.MinValue

  final case class StripCols(stripIdx: Int, down: Array[Long], up: Array[Long])

  /** Combined payload of strips strictly above / strictly below. */
  final case class Incoming(stripIdx: Int, above: Array[Long], below: Array[Long])

  /** `cols` is consumed twice (count + scan) — callers should persist it. */
  def scan(spark: SparkSession, cols: Dataset[StripCols], w: Int): Dataset[Incoming] = {
    import spark.implicits._
    val nStrips = cols.count().toInt
    if (nStrips == 0) return spark.emptyDataset[Incoming]
    // per-block-task memory = nStrips × blockW × 16 B; 4M longs ≈ 64 MiB
    val blockW = math.max(256, math.min(w, (4 << 20) / math.max(1, nStrips)))
    val nBlocks = (w + blockW - 1) / blockW
    val wV = w
    val blockRows = cols.flatMap { c =>
      (0 until nBlocks).iterator.map { b =>
        val x0 = b * blockW; val x1 = math.min(wV, x0 + blockW)
        (b, c.stripIdx,
          java.util.Arrays.copyOfRange(c.down, x0, x1),
          java.util.Arrays.copyOfRange(c.up, x0, x1))
      }
    }
    val incBlocks = blockRows.groupByKey(_._1).flatMapGroups { (b, it) =>
      val rows = it.toArray.sortBy(_._2)
      val bw = rows(0)._3.length
      val run = Array.fill(bw)(Absent)
      val above = rows.map { r =>
        val a = run.clone()
        var x = 0
        while (x < bw) { if (r._3(x) != Absent) run(x) = r._3(x); x += 1 }
        a
      }
      java.util.Arrays.fill(run, Absent)
      val below = new Array[Array[Long]](rows.length)
      var k = rows.length - 1
      while (k >= 0) {
        below(k) = run.clone()
        val r = rows(k)
        var x = 0
        while (x < bw) { if (r._4(x) != Absent) run(x) = r._4(x); x += 1 }
        k -= 1
      }
      rows.indices.iterator.map(k => (rows(k)._2, b, above(k), below(k)))
    }
    incBlocks.groupByKey(_._1).mapGroups { (stripIdx, it) =>
      val above = Array.fill(wV)(Absent)
      val below = Array.fill(wV)(Absent)
      it.foreach { case (_, b, a, bl) =>
        val x0 = b * blockW
        System.arraycopy(a, 0, above, x0, a.length)
        System.arraycopy(bl, 0, below, x0, bl.length)
      }
      Incoming(stripIdx, above, below)
    }
  }
}
