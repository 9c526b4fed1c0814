package graft.raster

import graft.core.{GLine, GPolygon, GeoTransform}
import scala.collection.mutable.ArrayBuffer

/** Raster→vector polygonization: a faithful re-expression of the
  * reference's two-pass connected-component algorithm
  * (`/root/reference/gdal/alg/polygonize.cpp:439` GDALPolygonizeT,
  * `gdal/alg/gdalrasterpolygonenumerator.cpp` ProcessLine/MergePolygon/
  * CompleteMerges, RPolygon segment coalescing `polygonize.cpp:40-250`),
  * including 4- vs 8-connectedness and the periodic flush emission order
  * (`polygonize.cpp:612-647`, flush every 8th line).
  *
  * Fixture gate: 13 features with DN values
  * [107,123,115,115,140,148,123,140,156,100,101,102,103] and the DN=156
  * hole-bearing polygon WKT (`autotest/alg/polygonize.py:70-86`).
  *
  * The distributed strip variant lives in [[RasterStrips]]; it reuses
  * [[Polygonize.Enumerator]] per strip and merges across strip boundaries
  * with a driver-side union-find (boundary rows only), then groups segments
  * by global polygon id and coalesces rings with the same [[RPoly]] logic.
  */
object Polygonize {

  /** GP_NODATA_MARKER (`gdal/alg/gdal_alg_priv.h:97`). */
  final val NoDataMarker: Int = -51502112

  /** Port of GDALRasterPolygonEnumeratorT<GInt32, IntEqualityTest>. */
  final class Enumerator(connectedness: Int) {
    require(connectedness == 4 || connectedness == 8)
    var polyIdMap: Array[Int] = new Array[Int](64)
    var polyValue: Array[Int] = new Array[Int](64)
    var nNextPolygonId: Int = 0

    private def newPolygon(value: Int): Int = {
      val id = nNextPolygonId
      if (id >= polyIdMap.length) {
        polyIdMap = java.util.Arrays.copyOf(polyIdMap, polyIdMap.length * 2 + 20)
        polyValue = java.util.Arrays.copyOf(polyValue, polyValue.length * 2 + 20)
      }
      nNextPolygonId += 1
      polyIdMap(id) = id
      polyValue(id) = value
      id
    }

    private def mergePolygon(srcId0: Int, dstIdInit: Int): Unit = {
      var dstIdFinal = dstIdInit
      while (polyIdMap(dstIdFinal) != dstIdFinal) dstIdFinal = polyIdMap(dstIdFinal)
      var cur = dstIdInit
      while (polyIdMap(cur) != cur) {
        val next = polyIdMap(cur)
        polyIdMap(cur) = dstIdFinal
        cur = next
      }
      var srcId = srcId0
      while (polyIdMap(srcId) != srcId) {
        val next = polyIdMap(srcId)
        polyIdMap(srcId) = dstIdFinal
        srcId = next
      }
      polyIdMap(srcId) = dstIdFinal
    }

    def completeMerges(): Unit = {
      var iPoly = 0
      while (iPoly < nNextPolygonId) {
        var nId = polyIdMap(iPoly)
        while (nId != polyIdMap(nId)) nId = polyIdMap(nId)
        var cur = polyIdMap(iPoly)
        polyIdMap(iPoly) = nId
        while (cur != polyIdMap(cur)) {
          val next = polyIdMap(cur)
          polyIdMap(cur) = nId
          cur = next
        }
        iPoly += 1
      }
    }

    /** lastVal/lastId null for the first line. Writes ids into thisId[0..n). */
    def processLine(lastVal: Array[Int], thisVal: Array[Int],
                    lastId: Array[Int], thisId: Array[Int],
                    lastOff: Int, thisOff: Int, n: Int): Unit = {
      val c8 = connectedness == 8
      if (lastVal == null) {
        var i = 0
        while (i < n) {
          if (thisVal(i) == NoDataMarker) thisId(thisOff + i) = -1
          else if (i == 0 || thisVal(i) != thisVal(i - 1))
            thisId(thisOff + i) = newPolygon(thisVal(i))
          else thisId(thisOff + i) = thisId(thisOff + i - 1)
          i += 1
        }
        return
      }
      var i = 0
      while (i < n) {
        val v = thisVal(i)
        if (v == NoDataMarker) {
          thisId(thisOff + i) = -1
        } else if (i > 0 && v == thisVal(i - 1)) {
          thisId(thisOff + i) = thisId(thisOff + i - 1)
          if (lastVal(i) == v &&
              polyIdMap(lastId(lastOff + i)) != polyIdMap(thisId(thisOff + i)))
            mergePolygon(lastId(lastOff + i), thisId(thisOff + i))
          if (c8 && lastVal(i - 1) == v &&
              polyIdMap(lastId(lastOff + i - 1)) != polyIdMap(thisId(thisOff + i)))
            mergePolygon(lastId(lastOff + i - 1), thisId(thisOff + i))
          if (c8 && i < n - 1 && lastVal(i + 1) == v &&
              polyIdMap(lastId(lastOff + i + 1)) != polyIdMap(thisId(thisOff + i)))
            mergePolygon(lastId(lastOff + i + 1), thisId(thisOff + i))
        } else if (lastVal(i) == v) {
          thisId(thisOff + i) = lastId(lastOff + i)
        } else if (i > 0 && c8 && lastVal(i - 1) == v) {
          thisId(thisOff + i) = lastId(lastOff + i - 1)
          if (i < n - 1 && lastVal(i + 1) == v &&
              polyIdMap(lastId(lastOff + i + 1)) != polyIdMap(thisId(thisOff + i)))
            mergePolygon(lastId(lastOff + i + 1), thisId(thisOff + i))
        } else if (i < n - 1 && c8 && lastVal(i + 1) == v) {
          thisId(thisOff + i) = lastId(lastOff + i + 1)
        } else {
          thisId(thisOff + i) = newPolygon(v)
        }
        i += 1
      }
    }
  }

  /** Port of RPolygon (`polygonize.cpp:40-250`): ring assembly from unit
    * pixel-edge segments with in-insertion coalescing.
    */
  final class RPoly(val value: Int) {
    var lastLineUpdated: Int = -1
    val strings = new ArrayBuffer[ArrayBuffer[Int]](4)

    def addSegment(x1_0: Int, y1_0: Int, x2_0: Int, y2_0: Int): Unit = {
      var x1 = x1_0; var y1 = y1_0; var x2 = x2_0; var y2 = y2_0
      lastLineUpdated = math.max(y1, y2)
      var iString = 0
      while (iString < strings.length) {
        val s = strings(iString)
        val sz = s.length
        if (s(sz - 2) == x1 && s(sz - 1) == y1) {
          var t = x2; x2 = x1; x1 = t
          t = y2; y2 = y1; y1 = t
        }
        if (s(sz - 2) == x2 && s(sz - 1) == y2) {
          // extend an existing collinear segment instead of adding a vertex
          val lastLen = math.max(math.abs(s(sz - 4) - s(sz - 2)),
                                 math.abs(s(sz - 3) - s(sz - 1)))
          if (sz >= 4 &&
              s(sz - 4) - s(sz - 2) == (s(sz - 2) - x1) * lastLen &&
              s(sz - 3) - s(sz - 1) == (s(sz - 1) - y1) * lastLen) {
            s.remove(s.length - 2, 2)
          }
          s += x1; s += y1
          return
        }
        iString += 1
      }
      val ns = new ArrayBuffer[Int](8)
      ns += x1; ns += y1; ns += x2; ns += y2
      strings += ns
    }

    private def merge(iBase: Int, iSrc: Int, dir: Int): Unit = {
      val base = strings(iBase)
      val src = strings(iSrc)
      var i = if (dir == 1) 1 else src.length / 2 - 2
      val end = if (dir == 1) src.length / 2 else -1
      while (i != end) {
        base += src(i * 2)
        base += src(i * 2 + 1)
        i += dir
      }
      if (iSrc < strings.length - 1) strings(iSrc) = strings(strings.length - 1)
      strings.remove(strings.length - 1)
    }

    def coalesce(): Unit = {
      var iBase = 0
      while (iBase < strings.length) {
        var again = true
        while (again) {
          again = false
          var iString = iBase + 1
          while (iString < strings.length) {
            val base = strings(iBase)
            val s = strings(iString)
            if (base(base.length - 2) == s(0) && base(base.length - 1) == s(1)) {
              merge(iBase, iString, 1)
              again = true
            } else if (base(base.length - 2) == s(s.length - 2) &&
                       base(base.length - 1) == s(s.length - 1)) {
              merge(iBase, iString, -1)
              again = true
            } else iString += 1
          }
        }
        iBase += 1
      }
    }

    /** Convert coalesced strings to a polygon in geo coords. */
    def toPolygon(gt: GeoTransform): GPolygon = {
      val rings = strings.map { s =>
        val np = s.length / 2
        val xy = new Array[Double](2 * np)
        var v = 0
        while (v < np) {
          xy(2 * v) = gt.geoX(s(2 * v), s(2 * v + 1))
          xy(2 * v + 1) = gt.geoY(s(2 * v), s(2 * v + 1))
          v += 1
        }
        GLine(xy)
      }
      GPolygon(rings.toArray)
    }
  }

  /** AddEdges port (`polygonize.cpp:268-330`): compare pixel (iX-1, iY) to
    * neighbor above and to the right; emit shared edges into both polygons.
    * `thisId`/`lastId` are border-padded rows (length n+2, -1 borders),
    * already mapped through nothing — the final-id mapping is applied here
    * via `idMap` (the first-pass map) and the RPoly pool keyed by final id.
    */
  def addEdges(thisId: Array[Int], lastId: Array[Int], idMap: Array[Int],
               polyValue: Array[Int], pool: Array[RPoly], iX: Int, iY: Int): Unit = {
    var nThisId = thisId(iX)
    var nRightId = thisId(iX + 1)
    var nPreviousId = lastId(iX)
    val iXReal = iX - 1
    if (nThisId != -1) nThisId = idMap(nThisId)
    if (nRightId != -1) nRightId = idMap(nRightId)
    if (nPreviousId != -1) nPreviousId = idMap(nPreviousId)
    if (nThisId != nPreviousId) {
      if (nThisId != -1) {
        if (pool(nThisId) == null) pool(nThisId) = new RPoly(polyValue(nThisId))
        pool(nThisId).addSegment(iXReal, iY, iXReal + 1, iY)
      }
      if (nPreviousId != -1) {
        if (pool(nPreviousId) == null) pool(nPreviousId) = new RPoly(polyValue(nPreviousId))
        pool(nPreviousId).addSegment(iXReal, iY, iXReal + 1, iY)
      }
    }
    if (nThisId != nRightId) {
      if (nThisId != -1) {
        if (pool(nThisId) == null) pool(nThisId) = new RPoly(polyValue(nThisId))
        pool(nThisId).addSegment(iXReal + 1, iY, iXReal + 1, iY + 1)
      }
      if (nRightId != -1) {
        if (pool(nRightId) == null) pool(nRightId) = new RPoly(polyValue(nRightId))
        pool(nRightId).addSegment(iXReal + 1, iY, iXReal + 1, iY + 1)
      }
    }
  }

  /** Single-node polygonize with the reference's emission order. `vals` is
    * row-major with nodata already replaced by [[NoDataMarker]].
    */
  def polygonize(vals: Array[Int], w: Int, h: Int, connectedness: Int,
                 gt: GeoTransform): Vector[(Int, GPolygon)] = {
    // pass 1: build the id map
    val first = new Enumerator(connectedness)
    var lastId = new Array[Int](w)
    var thisId = new Array[Int](w)
    var lastRow: Array[Int] = null
    var iY = 0
    while (iY < h) {
      val row = java.util.Arrays.copyOfRange(vals, iY * w, (iY + 1) * w)
      first.processLine(lastRow, row, lastId, thisId, 0, 0, w)
      val t = lastId; lastId = thisId; thisId = t
      lastRow = row
      iY += 1
    }
    first.completeMerges()

    // pass 2: collect edges with a fresh enumerator (same raw id sequence)
    val second = new Enumerator(connectedness)
    val pool = new Array[RPoly](first.nNextPolygonId)
    val out = Vector.newBuilder[(Int, GPolygon)]
    val lastIdB = Array.fill(w + 2)(-1)
    val thisIdB = Array.fill(w + 2)(-1)
    var lastB = lastIdB; var thisB = thisIdB
    lastRow = null
    iY = 0
    while (iY <= h) {
      if (iY == h) {
        java.util.Arrays.fill(thisB, -1)
      } else {
        val row = java.util.Arrays.copyOfRange(vals, iY * w, (iY + 1) * w)
        second.processLine(lastRow, row, lastB, thisB, 1, 1, w)
        thisB(0) = -1; thisB(w + 1) = -1
        lastRow = row
      }
      var iX = 0
      while (iX < w + 1) {
        addEdges(thisB, lastB, first.polyIdMap, first.polyValue, pool, iX, iY)
        iX += 1
      }
      // periodic flush of polygons finished at least 2 lines ago
      if (iY % 8 == 7) {
        var i = 0
        while (i < second.nNextPolygonId) {
          if (pool(i) != null && pool(i).lastLineUpdated < iY - 1) {
            pool(i).coalesce()
            out += ((pool(i).value, pool(i).toPolygon(gt)))
            pool(i) = null
          }
          i += 1
        }
      }
      val t = lastB; lastB = thisB; thisB = t
      iY += 1
    }
    var i = 0
    while (i < second.nNextPolygonId) {
      if (pool(i) != null) {
        pool(i).coalesce()
        out += ((pool(i).value, pool(i).toPolygon(gt)))
        pool(i) = null
      }
      i += 1
    }
    out.result()
  }
}
