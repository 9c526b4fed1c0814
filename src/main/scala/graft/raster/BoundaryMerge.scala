package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed strip-boundary component merge for the 2-phase connected-
  * components layout (polygonize, sieve).
  *
  * The naive layout collects every strip's top and bottom pixel rows to
  * the driver (O(strips × width) driver memory — gigabytes on a 10⁶-px-wide
  * raster). Here the boundary matching itself runs in a shuffle: strip k
  * contributes its bottom row to boundary k and its top row to boundary
  * k−1; each boundary group (two rows) emits only the DEDUPED global-id
  * equivalence pairs found along it. The driver collects
  * O(#boundary components) pairs plus one (stripIdx, nIds) int pair per
  * strip — never pixel rows — and runs the union-find over those.
  *
  * The "previous strip's bottom row" halo that downstream passes need is
  * likewise a Dataset keyed by the consuming strip's index (cogroup it
  * with the strips), not a driver-built broadcast map of full rows.
  */
object BoundaryMerge {

  /** Per-strip boundary summary from the local CC pass: local component
    * count plus the top/bottom pixel rows with their final local ids.
    */
  final case class BoundarySummary(
      stripIdx: Int, nIds: Int,
      topVals: Array[Int], topIds: Array[Int],
      botVals: Array[Int], botIds: Array[Int])

  /** Bottom-row halo of strip `stripIdx − 1`, keyed by the CONSUMING
    * strip: pixel values + global root ids.
    */
  final case class Halo(stripIdx: Int, vals: Array[Int], gids: Array[Long])

  /** @param base   prefix-sum of per-strip local component counts
    *               (base(k) = first global id of strip k); length nStrips+1
    * @param roots  union-find results (non-root gids only)
    * @param halos  bottom-row halo per consuming strip (lazy, distributed)
    * @param nPairs number of equivalence pairs the driver collected —
    *               the ONLY per-pixel-derived driver traffic, O(#boundary
    *               components) after per-boundary dedup
    */
  final case class Merged(base: Array[Long], roots: Map[Long, Long],
                          halos: Dataset[Halo], nPairs: Int)

  /** Equivalence pairs collected by the most recent merge (test hook for
    * asserting driver traffic stays O(pairs) on wide fixtures).
    */
  @volatile var lastDriverPairs: Int = -1

  /** Strip indices must be contiguous from 0 (they are strip positions).
    * `summaries` is consumed by three actions — callers should persist it.
    */
  def merge(spark: SparkSession, summaries: Dataset[BoundarySummary],
            w: Int, conn: Int): Merged = {
    import spark.implicits._
    val counts = summaries.map(s => (s.stripIdx, s.nIds)).collect().sortBy(_._1)
    val n = counts.length
    require(counts.iterator.map(_._1).zipWithIndex.forall { case (s, i) => s == i },
      "strip indices must be contiguous from 0")
    val base = new Array[Long](n + 1)
    var i = 0
    while (i < n) { base(i + 1) = base(i) + counts(i)._2; i += 1 }
    val sc = spark.sparkContext
    val baseB = sc.broadcast(base)
    val connV = conn
    val wV = w

    // adjacent-boundary shuffle: each boundary b sees (bottom of strip b,
    // top of strip b+1) and emits deduped equivalence pairs
    val boundaryRows = summaries.flatMap { s =>
      val lo = (s.stripIdx, true, s.botVals, s.botIds)
      val hi = (s.stripIdx - 1, false, s.topVals, s.topIds)
      if (s.stripIdx == 0) Iterator(lo) else Iterator(lo, hi)
    }
    val pairs: Array[(Long, Long)] =
      boundaryRows.groupByKey(_._1).flatMapGroups { (b, it) =>
        var botVals: Array[Int] = null; var botIds: Array[Int] = null
        var topVals: Array[Int] = null; var topIds: Array[Int] = null
        it.foreach { case (_, isLo, vals, ids) =>
          if (isLo) { botVals = vals; botIds = ids }
          else { topVals = vals; topIds = ids }
        }
        if (botVals == null || topVals == null) Iterator.empty
        else {
          val loBase = baseB.value(b); val hiBase = baseB.value(b + 1)
          val seen = new java.util.HashSet[(Long, Long)]()
          val out = Vector.newBuilder[(Long, Long)]
          @inline def u(a: Long, c: Long): Unit = {
            val p = (math.min(a, c), math.max(a, c))
            if (seen.add(p)) out += p
          }
          var x = 0
          while (x < wV) {
            val v = botVals(x)
            if (v != Polygonize.NoDataMarker) {
              if (topVals(x) == v) u(loBase + botIds(x), hiBase + topIds(x))
              if (connV == 8) {
                if (x > 0 && topVals(x - 1) == v)
                  u(loBase + botIds(x), hiBase + topIds(x - 1))
                if (x < wV - 1 && topVals(x + 1) == v)
                  u(loBase + botIds(x), hiBase + topIds(x + 1))
              }
            }
            x += 1
          }
          out.result().iterator
        }
      }.collect()
    lastDriverPairs = pairs.length

    // driver union-find over pairs only
    val parent = new scala.collection.mutable.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots: Map[Long, Long] = parent.keys.map(x => x -> find(x)).toMap
    val rootsB = sc.broadcast(roots)

    val halos = summaries.map { s =>
      val sBase = baseB.value(s.stripIdx)
      val rm = rootsB.value
      val g = new Array[Long](s.botIds.length)
      var x = 0
      while (x < g.length) {
        val id = s.botIds(x)
        g(x) = if (id == -1) -1L
               else { val gid = sBase + id; rm.getOrElse(gid, gid) }
        x += 1
      }
      Halo(s.stripIdx + 1, s.botVals, g)
    }
    Merged(base, roots, halos, pairs.length)
  }
}
