package graft.raster

import graft.core.Ckpt.CkptOps
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
object Sieve extends Serializable {

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

  /** One component's partial stats within a strip. */
  final case class CompPart(gid: Long, size: Int, value: Int)

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
    *  A. per-strip CC (enumerator) → boundary summaries, kept DISTRIBUTED;
    *  B. adjacent-boundary shuffle emits deduped equivalence pairs; the
    *     driver union-find consumes O(#boundary components) pairs plus one
    *     count per strip, never pixel rows ([[BoundaryMerge]]);
    *  C. global component sizes/values as a DataFrame AGGREGATION of
    *     per-strip partials (map-side combined, never driver-collected);
    *  D. biggest-neighbour selection as an argmax AGGREGATION: the
    *     sequential CompareNeighbour loop's strict-less update keeps the
    *     first-encountered maximum in (y, x, sub) scan order, which equals
    *     argmax over (neighbour size, −first-encounter position) — a
    *     groupBy, not a driver replay of the pair stream;
    *  E. distributed pointer-doubling over the small-polygon pointer graph;
    *  F. per-strip rewrite: the (global id → new value) table is broadcast
    *     when small, else shipped per-strip via a shuffle join on stripIdx
    *     (salt-and-pepper noise makes #small ≈ pixels/2 — too big to
    *     materialize on the driver).
    */
  def sieve(spark: SparkSession, stripsIn: Dataset[IStrip], w: Int, h: Int,
            threshold: Int, conn: Int,
            bcastRewriteLimit: Long = 4000000L): Dataset[IStrip] = {
    import spark.implicits._

    // the strip set is scanned by three separate stages (summaries,
    // component stats, final rewrite) — cache it so upstream lineage
    // (a rasterize/warp feeding the sieve) is not recomputed per stage
    val strips = stripsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // A: per-strip CC boundary summaries (distributed)
    val summariesDs = strips.map { s =>
      val (en, topIds, botIds) = localCC(s.vals, w, s.height, conn)
      BoundaryMerge.BoundarySummary(s.stripIdx, en.nNextPolygonId,
        java.util.Arrays.copyOfRange(s.vals, 0, w), topIds,
        java.util.Arrays.copyOfRange(s.vals, (s.height - 1) * w, s.height * w), botIds)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // B: boundary pairs shuffle → union-find (driver when the pair count
    // is small, a distributed Spark job otherwise)
    val merged = BoundaryMerge.merge(spark, summariesDs, w, conn)
    val rootsB = spark.sparkContext.broadcast(merged.roots)
    val baseB = spark.sparkContext.broadcast(merged.base)

    // distributed mode: per-strip root arrays ride with the strip via one
    // cogroup, so the flatMap-shaped stages below never need a broadcast
    // of the (potentially huge) roots table
    val enriched: Dataset[(IStrip, Array[Long], Array[Long])] =
      if (!merged.distributed) null
      else {
        val sideRoots = merged.side.filter(sd => sd.rootGids != null)
        strips.groupByKey(_.stripIdx)
          .cogroup(sideRoots.groupByKey(_.stripIdx)) { (_, sIt, rIt) =>
            var rg: Array[Long] = null; var rr: Array[Long] = null
            rIt.foreach { sd => rg = sd.rootGids; rr = sd.rootRoots }
            sIt.map(s => (s, rg, rr))
          }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }

    // C: global component sizes/values — distributed aggregation of
    // per-strip partials (one CompPart row per local component)
    def compParts(s: IStrip, root: Long => Long): Iterator[CompPart] = {
      val myBase = baseB.value(s.stripIdx)
      val (en, _, _) = localCC(s.vals, w, s.height, conn)
      val sizes = new Array[Int](en.nNextPolygonId)
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
          if (raw >= 0) sizes(en.polyIdMap(raw)) += 1
          x += 1
        }
        val t = lastId; lastId = thisId; thisId = t
        lastRow = row
        r += 1
      }
      (0 until en.nNextPolygonId).iterator.filter(sizes(_) > 0).map { f =>
        val gid = myBase + f
        CompPart(root(gid), sizes(f), en.polyValue(f))
      }
    }
    val compStats =
      if (!merged.distributed) strips.flatMap { s =>
        val rMap = rootsB.value
        compParts(s, gid => rMap.getOrElse(gid, gid))
      }
      else enriched.flatMap { case (s, rg, rr) =>
        compParts(s, BoundaryMerge.rootFn(rg, rr))
      }
    import org.apache.spark.sql.functions.{col, count => _, _}
    val sizesDF = compStats.toDF("gid", "size", "value")
      .groupBy(col("gid"))
      .agg(sum(col("size")).cast("int").as("gsize"), first(col("value")).as("gvalue"))
      .ckpt()

    // D: scan-ordered effective neighbour pair occurrences (distributed);
    // the previous strip's bottom-row halo arrives via cogroup
    val pairs = strips.groupByKey(_.stripIdx)
      .cogroup(merged.side.groupByKey(_.stripIdx)) { (_, sIt, sideIt) =>
      val sides = sideIt.toSeq
      val localRoots = BoundaryMerge.sideRootMap(sides)
      sIt.flatMap { s =>
      val myBase = baseB.value(s.stripIdx)
      val rMap = rootsB.value
      @inline def global(localFinal: Int): Long =
        BoundaryMerge.lookup(localRoots, rMap, myBase + localFinal)
      val (en1, _, _) = localCC(s.vals, w, s.height, conn)
      val en2 = new Polygonize.Enumerator(conn)
      val out = Seq.newBuilder[NeighborPair]
      var lastG: Array[Long] = null
      var lastRowVals: Array[Int] = null
      sides.foreach { sd =>
        if (sd.haloVals != null) { lastG = sd.haloGids; lastRowVals = sd.haloVals }
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
      }
    }

    // biggest-neighbour argmax: first-encountered maximum in scan order
    // ≡ max_by(q, (size(q), −firstOccurrence(p,q)))
    val occ = pairs.toDF("y", "x", "sub", "g1", "g2")
      .withColumn("pos", (col("y").cast("long") * w + col("x")) * 4 + col("sub"))
    val directed = occ.select(col("g1").as("p"), col("g2").as("q"), col("pos"))
      .unionAll(occ.select(col("g2").as("p"), col("g1").as("q"), col("pos")))
    val firstOcc = directed.groupBy(col("p"), col("q")).agg(min(col("pos")).as("fpos"))
    val bigDF = firstOcc
      .join(sizesDF.select(col("gid").as("q"), col("gsize").as("qsize"),
        col("gvalue").as("qvalue")), "q")
      .groupBy(col("p"))
      .agg(max_by(struct(col("q"), col("qsize"), col("qvalue")),
        struct(col("qsize"), -col("fpos"))).as("b"))
      .select(col("p"), col("b.q").as("q"), col("b.qsize").as("qsize"),
        col("b.qvalue").as("qvalue"))

    // E: distributed pointer-doubling over the small-polygon pointer graph
    // (gid → biggest small neighbor, or resolved value when the biggest
    // neighbor is large). Each round composes the pointer function with
    // itself, so chains of length L resolve in O(log L) rounds; pure-small
    // cycles never resolve (active count stops shrinking → break), which
    // matches the serial walk's visited-set stop. Only the FINAL
    // (gid → replacement value) map — O(resolved small polygons), which
    // must broadcast to executors anyway — ever reaches the driver;
    // the former O(small)·chain walk is gone.
    val smallPtr0 = sizesDF.filter(col("gsize") < threshold)
      .join(bigDF, col("gid") === col("p"), "left")
      .select(col("gid"), col("gvalue"),
        when(col("q").isNotNull && col("qsize") < threshold, col("q"))
          .otherwise(lit(null).cast("long")).as("next"),
        when(col("q").isNotNull && col("qsize") >= threshold, col("qvalue"))
          .otherwise(lit(null).cast("int")).as("res"))
    var f = smallPtr0.ckpt()
    var active = f.filter(col("next").isNotNull && col("res").isNull).count()
    var prevActive = Long.MaxValue
    var ptrIter = 0
    while (active > 0 && active < prevActive && ptrIter < 48) {
      prevActive = active
      val b = f.select(col("gid").as("b_gid"), col("next").as("b_next"),
        col("res").as("b_res"))
      val nf = f.join(b, f("next") === col("b_gid"), "left")
        .select(f("gid"), f("gvalue"),
          when(f("res").isNotNull, lit(null).cast("long"))
            .otherwise(col("b_next")).as("next"),
          coalesce(f("res"), col("b_res")).as("res"))
        .ckpt()
      f.unpersist()
      f = nf
      active = f.filter(col("next").isNotNull && col("res").isNull).count()
      ptrIter += 1
    }
    val rewriteDF = f
      .filter(col("res").isNotNull && col("gvalue") =!= Polygonize.NoDataMarker)
      .select(col("gid"), col("res").cast("int").as("res"))
      .ckpt()
    f.unpersist()

    // F: per-strip rewrite. The resolved (gid → value) table is applied
    // via broadcast when it fits, else via a shuffle join on stripIdx so
    // it never materializes on the driver (salt-and-pepper noise makes
    // #small components ≈ pixels/2).
    val nRewrites = rewriteDF.count()
    // strips with their root source attached: per-strip arrays in
    // distributed mode, the broadcast map otherwise (null arrays)
    def withRoots: Dataset[(IStrip, Array[Long], Array[Long])] =
      if (merged.distributed) enriched
      else strips.map(s => (s, null: Array[Long], null: Array[Long]))
    def rootOf(rg: Array[Long], rr: Array[Long]): Long => Long =
      if (rg != null) BoundaryMerge.rootFn(rg, rr)
      else { val m = rootsB.value; gid => m.getOrElse(gid, gid) }
    val out =
      if (nRewrites <= bcastRewriteLimit) {
        val rw = rewriteDF.as[(Long, Int)].collect().toMap
        val rewriteB = spark.sparkContext.broadcast(rw)
        withRoots.map { case (s, rg, rr) =>
          rewriteStrip(s, w, conn, baseB.value, rootOf(rg, rr), rewriteB.value) }
      } else {
        // per-strip (root gid) inventory → join with the rewrite table →
        // group the strip's own rewrite entries back to it
        val stripRoots = withRoots.flatMap { case (s, rg, rr) =>
          val myBase = baseB.value(s.stripIdx)
          val root = rootOf(rg, rr)
          val (en, _, _) = localCC(s.vals, w, s.height, conn)
          val seen = new java.util.HashSet[Long]()
          (0 until en.nNextPolygonId).iterator.flatMap { fId =>
            val r = root(myBase + fId)
            if (seen.add(r)) Iterator((r, s.stripIdx)) else Iterator.empty
          }
        }.toDF("gid", "stripIdx")
        val byStrip = stripRoots.join(rewriteDF, "gid")
          .select(col("stripIdx"), col("gid"), col("res"))
          .as[(Int, Long, Int)]
        withRoots.groupByKey(_._1.stripIdx)
          .cogroup(byStrip.groupByKey(_._1)) { (_, sIt, rIt) =>
            val rw: Map[Long, Int] = rIt.map(t => t._2 -> t._3).toMap
            sIt.map { case (s, rg, rr) =>
              rewriteStrip(s, w, conn, baseB.value, rootOf(rg, rr), rw) }
          }
      }
    // materialize before dropping the caches: `out`'s final rewrite pass
    // is lazy, and unpersisting first would recompute the whole input
    // lineage one more time
    val res = out.ckpt()
    summariesDs.unpersist(false)
    strips.unpersist(false)
    if (enriched != null) enriched.unpersist(false)
    res
  }

  /** Apply a (root gid → replacement value) map to one strip. */
  private def rewriteStrip(s: IStrip, w: Int, conn: Int, base: Array[Long],
                           rMap: Long => Long,
                           rw: scala.collection.Map[Long, Int]): IStrip = {
    val myBase = base(s.stripIdx)
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
          val root = rMap(gid)
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
