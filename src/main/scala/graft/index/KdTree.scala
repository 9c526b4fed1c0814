package graft.index

/** In-memory 2-D k-d tree for per-partition kNN refinement — the local
  * analogue of the reference's quadtree radius search
  * (`/root/reference/gdal/port/cpl_quad_tree.cpp:146` create, `:682`
  * search; used by the gridding kNN, `gdal/alg/gdalgrid.cpp:265-385`).
  *
  * Array-based median-split build (O(n log n)), branch-and-bound kNN with
  * a bounded max-heap (O(log n + k) expected per query).
  */
final class KdTree private (xs: Array[Double], ys: Array[Double], ids: Array[Long],
                            idx: Array[Int]) extends Serializable {

  /** (dist², id) pairs of the k nearest points, sorted ascending by
    * (dist², id).
    */
  def knn(qx: Double, qy: Double, k: Int): Array[(Double, Long)] = {
    if (idx.isEmpty || k <= 0) return Array.empty
    // bounded max-heap on dist² (ties by id kept deterministic at sort)
    val heapD = new Array[Double](k)
    val heapI = new Array[Long](k)
    var size = 0
    @inline def worst: Double = heapD(0)
    def push(d: Double, id: Long): Unit = {
      if (size < k) {
        heapD(size) = d; heapI(size) = id
        var i = size
        size += 1
        while (i > 0 && heapD((i - 1) / 2) < heapD(i)) {
          val p = (i - 1) / 2
          val td = heapD(p); heapD(p) = heapD(i); heapD(i) = td
          val ti = heapI(p); heapI(p) = heapI(i); heapI(i) = ti
          i = p
        }
      } else if (d < heapD(0) || (d == heapD(0) && id < heapI(0))) {
        heapD(0) = d; heapI(0) = id
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && heapD(l) > heapD(m)) m = l
          if (r < size && heapD(r) > heapD(m)) m = r
          if (m == i) done = true
          else {
            val td = heapD(m); heapD(m) = heapD(i); heapD(i) = td
            val ti = heapI(m); heapI(m) = heapI(i); heapI(i) = ti
            i = m
          }
        }
      }
    }

    def search(lo: Int, hi: Int, axisX: Boolean): Unit = {
      if (lo > hi) return
      val mid = (lo + hi) >>> 1
      val p = idx(mid)
      val dx = xs(p) - qx
      val dy = ys(p) - qy
      push(dx * dx + dy * dy, ids(p))
      val delta = if (axisX) dx else dy
      val (near, far) =
        if (delta > 0) ((lo, mid - 1), (mid + 1, hi)) else ((mid + 1, hi), (lo, mid - 1))
      search(near._1, near._2, !axisX)
      if (size < k || delta * delta <= worst)
        search(far._1, far._2, !axisX)
    }
    search(0, idx.length - 1, axisX = true)
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (heapD(i), heapI(i)); i += 1 }
    scala.util.Sorting.stableSort(out, (a: (Double, Long), b: (Double, Long)) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

object KdTree {
  def build(xs: Array[Double], ys: Array[Double], ids: Array[Long]): KdTree = {
    require(xs.length == ys.length && ys.length == ids.length)
    val idx = Array.range(0, xs.length)
    def sortRange(lo: Int, hi: Int, axisX: Boolean): Unit = {
      if (hi - lo < 1) return
      val sub = java.util.Arrays.copyOfRange(idx, lo, hi + 1)
      val sorted = sub.sortBy(i => if (axisX) (xs(i), ys(i), ids(i)) else (ys(i), xs(i), ids(i)))
      System.arraycopy(sorted, 0, idx, lo, sorted.length)
      val mid = (lo + hi) >>> 1
      sortRange(lo, mid - 1, !axisX)
      sortRange(mid + 1, hi, !axisX)
    }
    sortRange(0, idx.length - 1, axisX = true)
    new KdTree(xs, ys, ids, idx)
  }
}
