package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.raster.Overview.IStrip

/** Sieve filter — removes raster polygons smaller than a threshold,
  * replacing them with the value of their largest neighbour polygon.
  * Faithful re-expression of `/root/reference/gdal/alg/gdalsievefilter.cpp`
  * (GDALSieveFilter): CC enumeration (shared [[Polygonize.Enumerator]]),
  * per-polygon size accumulation, scan-order biggest-neighbour selection
  * (`CompareNeighbour`, `:104-137` — strict-less update keeps the first
  * encountered maximum, which is order-sensitive and preserved here),
  * chain-walking for too-small neighbours with cycle detection
  * (`:428-500`), and the final rewrite pass.
  *
  * Golden gates: checksums 364 / 370 / 451
  * (`autotest/alg/sieve.py:55,:85,:117`).
  */
object Sieve {

  /** Single-node exact port. `vals` row-major (no mask: every value incl.
    * any "nodata" value participates, matching SieveFilter(…, None, …)).
    */
  def sieveLocal(vals: Array[Int], w: Int, h: Int, threshold: Int, conn: Int): Array[Int] = {
    // pass 1: enumerate + sizes
    val en = new Polygonize.Enumerator(conn)
    var lastId = new Array[Int](w)
    var thisId = new Array[Int](w)
    var lastRow: Array[Int] = null
    val sizes = new scala.collection.mutable.ArrayBuffer[Int]()
    var y = 0
    while (y < h) {
      val row = java.util.Arrays.copyOfRange(vals, y * w, (y + 1) * w)
      en.processLine(lastRow, row, lastId, thisId, 0, 0, w)
      while (sizes.length < en.nNextPolygonId) sizes += 0
      var x = 0
      while (x < w) {
        val p = thisId(x)
        if (p >= 0) sizes(p) += 1
        x += 1
      }
      val t = lastId; lastId = thisId; thisId = t
      lastRow = row
      y += 1
    }
    en.completeMerges()
    var i = 0
    while (i < en.nNextPolygonId) {
      if (en.polyIdMap(i) != i) {
        sizes(en.polyIdMap(i)) += sizes(i)
        sizes(i) = 0
      }
      i += 1
    }

    // pass 2: biggest neighbour in scan order
    val big = Array.fill(en.nNextPolygonId)(-1)
    @inline def compare(raw1: Int, raw2: Int): Unit = {
      if (raw1 < 0 || raw2 < 0) return
      val p1 = en.polyIdMap(raw1)
      val p2 = en.polyIdMap(raw2)
      if (p1 == p2) return
      if (big(p1) == -1 || sizes(big(p1)) < sizes(p2)) big(p1) = p2
      if (big(p2) == -1 || sizes(big(p2)) < sizes(p1)) big(p2) = p1
    }
    val second = new Polygonize.Enumerator(conn)
    lastId = new Array[Int](w); thisId = new Array[Int](w)
    lastRow = null
    y = 0
    while (y < h) {
      val row = java.util.Arrays.copyOfRange(vals, y * w, (y + 1) * w)
      second.processLine(lastRow, row, lastId, thisId, 0, 0, w)
      var x = 0
      while (x < w) {
        if (y > 0) {
          compare(thisId(x), lastId(x))
          if (x > 0 && conn == 8) compare(thisId(x), lastId(x - 1))
          if (x < w - 1 && conn == 8) compare(thisId(x), lastId(x + 1))
        }
        if (x > 0) compare(thisId(x), thisId(x - 1))
        x += 1
      }
      val t = lastId; lastId = thisId; thisId = t
      lastRow = row
      y += 1
    }

    resolveAndRewrite(vals, w, h, conn, en, sizes.toArray, big, threshold)
  }

  /** Chain-walk small polygons to a big-enough neighbour, then rewrite. */
  private[raster] def resolveAndRewrite(vals: Array[Int], w: Int, h: Int, conn: Int,
                                        en: Polygonize.Enumerator, sizes: Array[Int],
                                        big: Array[Int], threshold: Int): Array[Int] = {
    var iPoly = 0
    while (iPoly < en.nNextPolygonId) {
      if (en.polyIdMap(iPoly) == iPoly && en.polyValue(iPoly) != Polygonize.NoDataMarker) {
        if (sizes(iPoly) >= threshold) big(iPoly) = -1
        else if (big(iPoly) != -1) {
          val visited = scala.collection.mutable.Set(iPoly)
          var finalId = iPoly
          var found = false
          var done = false
          while (!done) {
            finalId = big(finalId)
            if (finalId < 0) done = true
            else if (sizes(finalId) >= threshold) { found = true; done = true }
            else if (visited.contains(finalId)) done = true
            else visited += finalId
          }
          if (!found) big(iPoly) = -1
          else {
            var cur = iPoly
            while (big(cur) != finalId) {
              val next = big(cur)
              big(cur) = finalId
              cur = next
            }
          }
        }
      }
      iPoly += 1
    }

    // pass 3: rewrite
    val out = vals.clone()
    val third = new Polygonize.Enumerator(conn)
    var lastId = new Array[Int](w)
    var thisId = new Array[Int](w)
    var lastRow: Array[Int] = null
    var y = 0
    while (y < h) {
      val row = java.util.Arrays.copyOfRange(vals, y * w, (y + 1) * w)
      third.processLine(lastRow, row, lastId, thisId, 0, 0, w)
      var x = 0
      while (x < w) {
        val raw = thisId(x)
        if (raw >= 0) {
          val p = en.polyIdMap(raw)
          if (big(p) != -1) out(y * w + x) = en.polyValue(big(p))
        }
        x += 1
      }
      val t = lastId; lastId = thisId; thisId = t
      lastRow = row
      y += 1
    }
    out
  }

  final case class StripCC(stripIdx: Int, nIds: Int,
                           topVals: Array[Int], topIds: Array[Int],
                           botVals: Array[Int], botIds: Array[Int],
                           localSizes: Array[Int], localValues: Array[Int])

  final case class NeighborPair(y: Int, x: Int, sub: Int, g1: Long, g2: Long)

  private def localCC(vals: Array[Int], w: Int, rows: Int, conn: Int):
      (Polygonize.Enumerator, Array[Int], Array[Int]) = {
    val en = new Polygonize.Enumerator(conn)
    var lastId = new Array[Int](w)
    var thisId = new Array[Int](w)
    var lastRow: Array[Int] = null
    var topIds: Array[Int] = null
    var r = 0
    while (r < rows) {
      val row = java.util.Arrays.copyOfRange(vals, r * w, (r + 1) * w)
      en.processLine(lastRow, row, lastId, thisId, 0, 0, w)
      if (r == 0) topIds = thisId.clone()
      val t = lastId; lastId = thisId; thisId = t
      lastRow = row
      r += 1
    }
    en.completeMerges()
    (en, topIds.map(i => if (i == -1) -1 else en.polyIdMap(i)),
      lastId.clone().map(i => if (i == -1) -1 else en.polyIdMap(i)))
  }

  /** Distributed sieve over strips — the genuinely-parallel layout:
    *
    *  A. per-strip CC (enumerator) + local sizes/values per component;
    *  B. driver union-find over strip-boundary rows only → global roots,
    *     global sizes (sum of local), global values — O(polygons) state;
    *  C. per-strip second pass emits the scan-ordered CompareNeighbour
    *     pairs, FILTERED to effective calls (p1 ≠ p2) — O(boundary
    *     length), not O(pixels);
    *  D. driver replays the pairs in (y, x, sub-order) — identical
    *     first-encounter semantics to the sequential reference — then
    *     chain-walks small polygons exactly like [[resolveAndRewrite]];
    *  E. per-strip rewrite with the broadcast (global id → new value) map.
    */
  def sieve(spark: SparkSession, strips: Dataset[IStrip], w: Int, h: Int,
            threshold: Int, conn: Int): Dataset[IStrip] = {
    import spark.implicits._

    // A: per-strip CC summaries
    val summaries = strips.map { s =>
      val (en, topIds, botIds) = localCC(s.vals, w, s.height, conn)
      val sizes = new Array[Int](en.nNextPolygonId)
      val values = new Array[Int](en.nNextPolygonId)
      // recompute per-pixel final ids for sizes (cheap second sweep)
      var lastId = new Array[Int](w); var thisId = new Array[Int](w)
      var lastRow: Array[Int] = null
      val en2 = new Polygonize.Enumerator(conn)
      var r = 0
      while (r < s.height) {
        val row = java.util.Arrays.copyOfRange(s.vals, r * w, (r + 1) * w)
        en2.processLine(lastRow, row, lastId, thisId, 0, 0, w)
        var x = 0
        while (x < w) {
          val raw = thisId(x)
          if (raw >= 0) {
            val f = en.polyIdMap(raw)
            sizes(f) += 1
            values(f) = en.polyValue(f)
          }
          x += 1
        }
        val t = lastId; lastId = thisId; thisId = t
        lastRow = row
        r += 1
      }
      StripCC(s.stripIdx, en.nNextPolygonId,
        java.util.Arrays.copyOfRange(s.vals, 0, w), topIds,
        java.util.Arrays.copyOfRange(s.vals, (s.height - 1) * w, s.height * w), botIds,
        sizes, values)
    }.collect().sortBy(_.stripIdx)

    // B: driver union-find across boundaries
    val base = new Array[Long](summaries.length + 1)
    summaries.zipWithIndex.foreach { case (s, i) => base(i + 1) = base(i) + s.nIds }
    val parent = new scala.collection.mutable.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var k = 0
    while (k < summaries.length - 1) {
      val lo = summaries(k); val hi = summaries(k + 1)
      var x = 0
      while (x < w) {
        val v = lo.botVals(x)
        if (v != Polygonize.NoDataMarker) {
          if (hi.topVals(x) == v) union(base(k) + lo.botIds(x), base(k + 1) + hi.topIds(x))
          if (conn == 8) {
            if (x > 0 && hi.topVals(x - 1) == v)
              union(base(k) + lo.botIds(x), base(k + 1) + hi.topIds(x - 1))
            if (x < w - 1 && hi.topVals(x + 1) == v)
              union(base(k) + lo.botIds(x), base(k + 1) + hi.topIds(x + 1))
          }
        }
        x += 1
      }
      k += 1
    }
    val roots: Map[Long, Long] = parent.keys.map(x => x -> find(x)).toMap
    val gSizes = new scala.collection.mutable.HashMap[Long, Int]
    val gValues = new scala.collection.mutable.HashMap[Long, Int]
    summaries.foreach { s =>
      var i = 0
      while (i < s.nIds) {
        if (s.localSizes(i) > 0) {
          val gid = base(s.stripIdx) + i
          val root = roots.getOrElse(gid, gid)
          gSizes(root) = gSizes.getOrElse(root, 0) + s.localSizes(i)
          gValues(root) = s.localValues(i)
        }
        i += 1
      }
    }
    val rootsB = spark.sparkContext.broadcast(roots)
    val baseB = spark.sparkContext.broadcast(base)
    val prevBotGlobal: Map[Int, (Array[Int], Array[Long])] =
      summaries.iterator.map { s =>
        val g = s.botIds.map(id => if (id == -1) -1L else {
          val gid = base(s.stripIdx) + id
          roots.getOrElse(gid, gid)
        })
        (s.stripIdx + 1) -> ((s.botVals, g))
      }.toMap
    val prevBotB = spark.sparkContext.broadcast(prevBotGlobal)

    // C: scan-ordered effective neighbour pairs
    val pairs = strips.flatMap { s =>
      val myBase = baseB.value(s.stripIdx)
      val rMap = rootsB.value
      @inline def global(localFinal: Int): Long = {
        val gid = myBase + localFinal
        rMap.getOrElse(gid, gid)
      }
      val (en1, _, _) = localCC(s.vals, w, s.height, conn)
      val en2 = new Polygonize.Enumerator(conn)
      val out = Seq.newBuilder[NeighborPair]
      var lastG: Array[Long] = null
      var lastRowVals: Array[Int] = null
      prevBotB.value.get(s.stripIdx).foreach { case (vals2, gids) =>
        lastG = gids; lastRowVals = vals2
      }
      var lastId = new Array[Int](w); var thisId = new Array[Int](w)
      var prevLocalRow: Array[Int] = null
      var r = 0
      while (r < s.height) {
        val row = java.util.Arrays.copyOfRange(s.vals, r * w, (r + 1) * w)
        en2.processLine(prevLocalRow, row, lastId, thisId, 0, 0, w)
        val thisG = new Array[Long](w)
        var x = 0
        while (x < w) {
          val raw = thisId(x)
          thisG(x) = if (raw == -1) -1L else global(en1.polyIdMap(raw))
          x += 1
        }
        val gy = s.yOff + r
        x = 0
        while (x < w) {
          @inline def emit(sub: Int, a: Long, b: Long): Unit =
            if (a >= 0 && b >= 0 && a != b) out += NeighborPair(gy, x, sub, a, b)
          if (gy > 0 && lastG != null) {
            emit(0, thisG(x), lastG(x))
            if (x > 0 && conn == 8) emit(1, thisG(x), lastG(x - 1))
            if (x < w - 1 && conn == 8) emit(2, thisG(x), lastG(x + 1))
          }
          if (x > 0) emit(3, thisG(x), thisG(x - 1))
          x += 1
        }
        val t = lastId; lastId = thisId; thisId = t
        prevLocalRow = row
        lastG = thisG
        r += 1
      }
      out.result().iterator
    }.collect().sortBy(p => (p.y, p.x, p.sub))

    // D: replay CompareNeighbour + chain resolution on global ids
    val big = new scala.collection.mutable.HashMap[Long, Long]
    pairs.foreach { p =>
      val b1 = big.get(p.g1)
      if (b1.isEmpty || gSizes.getOrElse(b1.get, 0) < gSizes.getOrElse(p.g2, 0)) big(p.g1) = p.g2
      val b2 = big.get(p.g2)
      if (b2.isEmpty || gSizes.getOrElse(b2.get, 0) < gSizes.getOrElse(p.g1, 0)) big(p.g2) = p.g1
    }
    val rewrite = new scala.collection.mutable.HashMap[Long, Int]
    gSizes.keys.toSeq.sorted.foreach { gid =>
      if (gValues(gid) != Polygonize.NoDataMarker && gSizes(gid) < threshold && big.contains(gid)) {
        val visited = scala.collection.mutable.Set(gid)
        var finalId = gid
        var found = false
        var done = false
        while (!done) {
          big.get(finalId) match {
            case None => done = true
            case Some(next) =>
              finalId = next
              if (gSizes.getOrElse(finalId, 0) >= threshold) { found = true; done = true }
              else if (visited.contains(finalId)) done = true
              else visited += finalId
          }
        }
        if (found) rewrite(gid) = gValues(finalId)
      }
    }
    val rewriteB = spark.sparkContext.broadcast(rewrite.toMap)

    // E: per-strip rewrite
    strips.map { s =>
      val myBase = baseB.value(s.stripIdx)
      val rMap = rootsB.value
      val rw = rewriteB.value
      val (en1, _, _) = localCC(s.vals, w, s.height, conn)
      val en2 = new Polygonize.Enumerator(conn)
      val out = s.vals.clone()
      var lastId = new Array[Int](w); var thisId = new Array[Int](w)
      var prevLocalRow: Array[Int] = null
      var r = 0
      while (r < s.height) {
        val row = java.util.Arrays.copyOfRange(s.vals, r * w, (r + 1) * w)
        en2.processLine(prevLocalRow, row, lastId, thisId, 0, 0, w)
        var x = 0
        while (x < w) {
          val raw = thisId(x)
          if (raw >= 0) {
            val gid = myBase + en1.polyIdMap(raw)
            val root = rMap.getOrElse(gid, gid)
            rw.get(root).foreach(v => out(r * w + x) = v)
          }
          x += 1
        }
        val t = lastId; lastId = thisId; thisId = t
        prevLocalRow = row
        r += 1
      }
      s.copy(vals = out)
    }
  }
}
