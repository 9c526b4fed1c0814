package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{BoundaryMerge, Polygonize, RasterStrips, Sieve, StripScan}
import graft.raster.Overview.IStrip
import graft.raster.RasterStrips.ValueStrip

/** Scale properties of the distributed strip-boundary machinery: on a WIDE
  * raster the driver must see O(#boundary components) equivalence pairs,
  * never O(width) pixel rows, and the sieve's join-based rewrite path must
  * match the broadcast path bit for bit.
  */
class BoundaryMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Wide fixture: W = 20000, 4 strips of 2 rows. Two vertical bars (a
    * component each spanning all strips) on a background component —
    * 3 components total, all crossing every boundary.
    */
  private val W = 20000
  private val H = 8
  private def wideVals: Array[Int] = {
    val v = Array.fill(W * H)(7)
    for (r <- 0 until H; bar <- Seq(5000, 15000); x <- bar until bar + 100)
      v(r * W + x) = 9
    v
  }

  test("wide raster: driver collects O(components) pairs, not O(width) rows") {
    val vals = wideVals
    val strips = (0 until 4).map { i =>
      ValueStrip(i, i * 2, 2, java.util.Arrays.copyOfRange(vals, i * 2 * W, (i + 1) * 2 * W))
    }.toDS()
    val df = RasterStrips.polygonize(spark, strips, W, H, 4,
      graft.core.GeoTransform(0, 1, 0, 0, 0, 1))
    // bars span every row, so they cut the background into 3 slabs:
    // 2 bar components + 3 background components
    assert(df.count() === 5)
    // driver-side pair traffic: a handful of component adjacencies per
    // boundary (3 boundaries × ≤5 components), NOT ~20000 per-column pairs
    assert(BoundaryMerge.lastDriverPairs >= 3)
    assert(BoundaryMerge.lastDriverPairs < 64,
      s"driver saw ${BoundaryMerge.lastDriverPairs} pairs — boundary dedup is broken")
  }

  test("sieve join-based rewrite path matches broadcast path") {
    val W5 = 5; val H7 = 7
    val src = Array(
      107, 123, 132, 115, 132,
      115, 132, 132, 123, 123,
      115, 132, 140, 132, 123,
      148, 132, 123, 123, 123,
      156, 156, 156, 140, 132,
      156, 100, 156, 101, 102,
      156, 156, 156, 103, 103)
    val expect = Sieve.sieveLocal(src, W5, H7, 2, 4)
    val strips = (0 until H7 by 3).zipWithIndex.map { case (y0, i) =>
      val hh = math.min(3, H7 - y0)
      IStrip(i, y0, hh, W5, java.util.Arrays.copyOfRange(src, y0 * W5, (y0 + hh) * W5))
    }.toDS()
    // bcastRewriteLimit = 0 forces the shuffle-join rewrite
    val got = Sieve.sieve(spark, strips, W5, H7, 2, 4, bcastRewriteLimit = 0L)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    assert(got.toSeq === expect.toSeq)
  }

  /** Force the distributed union-find (conf limit 0) and compare against
    * the driver path bit for bit on a salt-and-pepper wide fixture —
    * 1-px vertical stripes make EVERY column a seam-crossing component
    * (w/2 pairs per seam, the documented driver-OOM shape at scale).
    */
  test("distributed union-find path: polygonize matches driver path, driver sees 0 pairs") {
    val Wd = 3000; val Hd = 8
    val vals = Array.tabulate(Wd * Hd)((i: Int) => (i % Wd) % 2)
    def strips() = (0 until 4).map { i =>
      ValueStrip(i, i * 2, 2, java.util.Arrays.copyOfRange(vals, i * 2 * Wd, (i + 1) * 2 * Wd))
    }.toDS()
    val gt = graft.core.GeoTransform(0, 1, 0, 0, 0, 1)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
      df.collect().map(r => (r.getInt(0),
        r.getAs[Array[Byte]](1).map("%02x".format(_)).mkString)).toSeq.sorted
    val viaDriver = canon(RasterStrips.polygonize(spark, strips(), Wd, Hd, 4, gt))
    assert(BoundaryMerge.lastDriverPairs === 3L * Wd) // one pair per column per seam
    spark.conf.set(BoundaryMerge.DriverPairLimitKey, "0")
    try {
      val viaDist = canon(RasterStrips.polygonize(spark, strips(), Wd, Hd, 4, gt))
      assert(BoundaryMerge.lastDriverPairs === 0L,
        "distributed path must not collect pairs to the driver")
      assert(viaDist.length === Wd) // every column its own component
      assert(viaDist === viaDriver)
    } finally spark.conf.unset(BoundaryMerge.DriverPairLimitKey)
  }

  test("distributed union-find path: sieve matches serial, both rewrite paths") {
    val Wd = 500; val Hd = 9
    // stripes of width 1 (size 9 each) + a few 2-wide stripes (size 18)
    val vals = Array.tabulate(Wd * Hd) { (i: Int) =>
      val x = i % Wd
      if (x % 10 < 2) 7 else x % 10
    }
    val expect = Sieve.sieveLocal(vals, Wd, Hd, 10, 4)
    spark.conf.set(BoundaryMerge.DriverPairLimitKey, "0")
    try {
      for (bcastLimit <- Seq(0L, 4000000L)) {
        val strips = (0 until 3).map { i =>
          IStrip(i, i * 3, 3, Wd, java.util.Arrays.copyOfRange(vals, i * 3 * Wd, (i + 1) * 3 * Wd))
        }.toDS()
        val got = Sieve.sieve(spark, strips, Wd, Hd, 10, 4, bcastRewriteLimit = bcastLimit)
          .collect().sortBy(_.yOff).flatMap(_.vals)
        assert(BoundaryMerge.lastDriverPairs === 0L)
        assert(got.toSeq === expect.toSeq, s"bcastRewriteLimit=$bcastLimit")
      }
    } finally spark.conf.unset(BoundaryMerge.DriverPairLimitKey)
  }

  test("UnionFind.roots matches a serial union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 400
    val edges = (0 until 600).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    // serial reference
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0 until n).map(v => v.toLong -> find(v).toLong)
      .filter(t => t._1 != t._2).toMap
    val got = graft.operators.UnionFind.roots(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("UnionFind.roots on empty and self-loop-only edges is empty") {
    assert(graft.operators.UnionFind.roots(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() === 0)
    assert(graft.operators.UnionFind.roots(
      Seq((5L, 5L), (9L, 9L)).toDF("a", "b")).count() === 0)
  }

  test("UnionFind.roots resolves a long path in logarithmic rounds") {
    // path 0-1-2-...-299: diameter 299; maxRounds 64 would fail if the
    // pointer doubling were not compounding with propagation
    val edges = (0 until 299).map(i => (i.toLong, (i + 1).toLong))
    val got = graft.operators.UnionFind.roots(edges.toDF("a", "b"), maxRounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1 to 299).map(v => v.toLong -> 0L).toMap)
  }

  test("StripScan prefix/suffix matches a serial scan") {
    val w = 1000
    val n = 7
    val rnd = new scala.util.Random(42)
    val payload = Array.tabulate(n, w) { (_, _) =>
      if (rnd.nextDouble() < 0.3) rnd.nextInt(1 << 20).toLong else StripScan.Absent
    }
    val cols = (0 until n).map(i => StripScan.StripCols(i, payload(i), payload(i))).toDS()
    val got = StripScan.scan(spark, cols, w).collect().sortBy(_.stripIdx)
    assert(got.length === n)
    // serial reference
    val run = Array.fill(w)(StripScan.Absent)
    for (k <- 0 until n) {
      assert(got(k).above.toSeq === run.toSeq, s"above strip $k")
      for (x <- 0 until w) if (payload(k)(x) != StripScan.Absent) run(x) = payload(k)(x)
    }
    java.util.Arrays.fill(run, StripScan.Absent)
    for (k <- n - 1 to 0 by -1) {
      assert(got(k).below.toSeq === run.toSeq, s"below strip $k")
      for (x <- 0 until w) if (payload(k)(x) != StripScan.Absent) run(x) = payload(k)(x)
    }
  }
}
