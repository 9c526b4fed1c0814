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
