package graft.index

import graft.core.{Envelope, GPolygon, Geom, GeomOps}

/** Deterministic hierarchical cell grid over lon/lat (an H3/S2-style index
  * hand-rolled for the offline build; plays the role of the reference's
  * .qix quadtree spatial index, `/root/reference/gdal/ogr/ogrsf_frmts/shape/
  * shptree.c:121`, and of the gridding quadtree radius search,
  * `gdal/alg/gdalgrid.cpp:265-385`).
  *
  * At resolution r the world rectangle [-180,180]×[-90,90] is divided into
  * 2^r × 2^r cells. A cell id packs (res, ix, iy) into one long:
  *
  *   cellId = res * 2^52 + ix * 2^26 + iy        (res ≤ 25, ix/iy < 2^25)
  *
  * The encoding is deliberately plain integer arithmetic (no bit
  * interleaving) so an external SQL engine can compute identical ids —
  * the correctness oracle recomputes cell ids in ANSI SQL.
  *
  * Hierarchy: parent(ix,iy)@r = (ix>>1, iy>>1)@(r-1). Neighbors clamp at
  * the ±90 poles and wrap in longitude.
  */
object CellGrid {

  final val MaxRes = 25
  private final val ResShift = 52
  private final val IxShift = 26

  @inline def cellsPerAxis(res: Int): Long = 1L << res

  @inline def lonToIx(lon: Double, res: Int): Long = {
    val n = cellsPerAxis(res)
    val f = (lon + 180.0) / 360.0
    val i = math.floor(f * n).toLong
    if (i < 0) 0L else if (i >= n) n - 1 else i
  }

  @inline def latToIy(lat: Double, res: Int): Long = {
    val n = cellsPerAxis(res)
    val f = (lat + 90.0) / 180.0
    val i = math.floor(f * n).toLong
    if (i < 0) 0L else if (i >= n) n - 1 else i
  }

  @inline def pack(res: Int, ix: Long, iy: Long): Long =
    (res.toLong << ResShift) | (ix << IxShift) | iy

  @inline def res(cell: Long): Int = (cell >>> ResShift).toInt
  @inline def ix(cell: Long): Long = (cell >>> IxShift) & ((1L << IxShift) - 1)
  @inline def iy(cell: Long): Long = cell & ((1L << IxShift) - 1)

  def cellId(lon: Double, lat: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"resolution $res out of [0,$MaxRes]")
    pack(res, lonToIx(lon, res), latToIy(lat, res))
  }

  def parent(cell: Long): Long = {
    val r = res(cell)
    require(r > 0, "res-0 cell has no parent")
    pack(r - 1, ix(cell) >> 1, iy(cell) >> 1)
  }

  def children(cell: Long): Array[Long] = {
    val r = res(cell)
    require(r < MaxRes)
    val bx = ix(cell) << 1; val by = iy(cell) << 1
    Array(pack(r + 1, bx, by), pack(r + 1, bx + 1, by),
          pack(r + 1, bx, by + 1), pack(r + 1, bx + 1, by + 1))
  }

  /** Geographic bounds of a cell. */
  def cellEnvelope(cell: Long): Envelope = {
    val r = res(cell)
    val n = cellsPerAxis(r).toDouble
    val x0 = -180.0 + 360.0 * ix(cell) / n
    val y0 = -90.0 + 180.0 * iy(cell) / n
    Envelope(x0, y0, x0 + 360.0 / n, y0 + 180.0 / n)
  }

  def cellCenter(cell: Long): (Double, Double) = {
    val e = cellEnvelope(cell)
    ((e.minX + e.maxX) / 2, (e.minY + e.maxY) / 2)
  }

  /** All cells at Chebyshev distance exactly `k` from `cell` (the ring),
    * wrapping in x, clamping in y. k=0 returns the cell itself. Mirrors the
    * expanding-search-window semantics of
    * `gdal/alg/gdalgrid.cpp:281-299` (quadtree AOI growth until enough
    * neighbors found).
    */
  def ring(cell: Long, k: Int): Array[Long] = {
    val r = res(cell)
    val n = cellsPerAxis(r)
    val cx = ix(cell); val cy = iy(cell)
    if (k == 0) return Array(cell)
    val out = new scala.collection.mutable.ArrayBuffer[Long](8 * k)
    def add(x: Long, y: Long): Unit = {
      if (y >= 0 && y < n) {
        val wx = ((x % n) + n) % n // wrap longitude
        out += pack(r, wx, y)
      }
    }
    var dx = -k
    while (dx <= k) { add(cx + dx, cy + k); add(cx + dx, cy - k); dx += 1 }
    var dy = -k + 1
    while (dy <= k - 1) { add(cx + k, cy + dy); add(cx - k, cy + dy); dy += 1 }
    out.distinct.toArray
  }

  /** All cells within Chebyshev distance ≤ k (the disk). */
  def disk(cell: Long, k: Int): Array[Long] =
    (0 to k).flatMap(ring(cell, _)).distinct.toArray

  /** Cells whose rectangle intersects the envelope (bbox polyfill). */
  def coverEnvelope(env: Envelope, res: Int): Array[Long] = {
    val x0 = lonToIx(env.minX, res); val x1 = lonToIx(env.maxX, res)
    val y0 = latToIy(env.minY, res); val y1 = latToIy(env.maxY, res)
    val nCells = (x1 - x0 + 1).toLong * (y1 - y0 + 1).toLong
    // loud, not a silent Int truncation (a world-spanning envelope at
    // res 16 is 2^32 cells — the caller needs a coarser res, not a
    // zero-length or negative array)
    require(nCells <= (1L << 26),
      s"coverEnvelope: envelope spans $nCells cells at res $res " +
        "(cap 2^26) — polyfill at a coarser resolution")
    val out = new Array[Long](nCells.toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out(i) = pack(res, x, y); i += 1; y += 1 }
      x += 1
    }
    out
  }

  /** Cells intersecting the geometry: bbox cover refined by an exact
    * cell-rectangle vs geometry test (keeps polygon polyfill tight so the
    * spatial join broadcasts fewer (cell → polygon) pairs).
    */
  def polyfill(g: Geom, res: Int): Array[Long] =
    coverEnvelope(g.envelope, res).filter { c =>
      val e = cellEnvelope(c)
      val rect = GPolygon(Array(graft.core.GLine(Array(
        e.minX, e.minY, e.maxX, e.minY, e.maxX, e.maxY, e.minX, e.maxY, e.minX, e.minY))))
      GeomOps.intersects(g, rect)
    }

  /** Pick the finest resolution whose cell is at least `minCellDeg` wide. */
  def resForCellWidth(minCellDeg: Double): Int = {
    var r = 0
    while (r < MaxRes && 360.0 / cellsPerAxis(r + 1) >= minCellDeg) r += 1
    r
  }
}
