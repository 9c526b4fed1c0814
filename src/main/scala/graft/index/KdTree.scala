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
        // max-heap under the COMPOSITE (d, id) order: the root must be
        // the worst kept pair, else an equal-distance candidate compared
        // only against an arbitrary root corrupts the smallest-ids tie set
        @inline def worse(a: Int, b: Int): Boolean =
          heapD(a) > heapD(b) || (heapD(a) == heapD(b) && heapI(a) > heapI(b))
        while (i > 0 && worse(i, (i - 1) / 2)) {
          val p = (i - 1) / 2
          val td = heapD(p); heapD(p) = heapD(i); heapD(i) = td
          val ti = heapI(p); heapI(p) = heapI(i); heapI(i) = ti
          i = p
        }
      } else if (d < heapD(0) || (d == heapD(0) && id < heapI(0))) {
        @inline def worse(a: Int, b: Int): Boolean =
          heapD(a) > heapD(b) || (heapD(a) == heapD(b) && heapI(a) > heapI(b))
        heapD(0) = d; heapI(0) = id
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && worse(l, m)) m = l
          if (r < size && worse(r, m)) m = r
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
  /** Median-split build via iterative quickselect (true O(n log n), no
    * boxing): each node only needs its range PARTITIONED around the
    * median under the composite (axis, other-axis, id) order, not fully
    * sorted — the old per-range tuple sortBy was O(n log^2 n) with three
    * boxed allocations per comparison.
    */
  def build(xs: Array[Double], ys: Array[Double], ids: Array[Long]): KdTree = {
    require(xs.length == ys.length && ys.length == ids.length)
    val idx = Array.range(0, xs.length)
    @inline def swap(a: Int, b: Int): Unit = {
      val t = idx(a); idx(a) = idx(b); idx(b) = t
    }
    // composite total order on point indices
    def lt(a: Int, b: Int, axisX: Boolean): Boolean = {
      val p1 = if (axisX) xs(a) else ys(a); val p2 = if (axisX) xs(b) else ys(b)
      if (p1 != p2) p1 < p2
      else {
        val s1 = if (axisX) ys(a) else xs(a); val s2 = if (axisX) ys(b) else xs(b)
        if (s1 != s2) s1 < s2 else ids(a) < ids(b)
      }
    }
    // Hoare quickselect: place the mid-th element, partitioning the range
    def nth(lo0: Int, hi0: Int, mid: Int, axisX: Boolean): Unit = {
      var lo = lo0; var hi = hi0
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (lt(idx(m), idx(lo), axisX)) swap(m, lo)
        if (lt(idx(hi), idx(lo), axisX)) swap(hi, lo)
        if (lt(idx(hi), idx(m), axisX)) swap(hi, m)
        val pivot = idx(m) // point index; its coords never move
        var i = lo - 1; var j = hi + 1
        var cont = true
        while (cont) {
          i += 1; while (lt(idx(i), pivot, axisX)) i += 1
          j -= 1; while (lt(pivot, idx(j), axisX)) j -= 1
          if (i >= j) cont = false else swap(i, j)
        }
        if (mid <= j) hi = j else lo = j + 1
      }
    }
    def buildRange(lo: Int, hi: Int, axisX: Boolean): Unit = {
      if (hi - lo < 1) return
      val mid = (lo + hi) >>> 1
      nth(lo, hi, mid, axisX)
      buildRange(lo, mid - 1, !axisX)
      buildRange(mid + 1, hi, !axisX)
    }
    buildRange(0, idx.length - 1, axisX = true)
    new KdTree(xs, ys, ids, idx)
  }
}
