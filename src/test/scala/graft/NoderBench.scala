package graft
import graft.core._

/** Grid vs sweep noder on a 10k-rectangle dissolve with mixed feature
  * scales (the coastline-complexity shape: a few huge features, many tiny
  * ones, some extreme aspect ratios — no single grid cell size fits all
  * three populations). Asserts both modes produce the same dissolved area,
  * then prints per-mode wall times. Run ad hoc:
  * `sbt -batch "Test/runMain graft.NoderBench [nRects]"`.
  */
object NoderBench {
  def rnd(seed: Long, k: Int): Double = {
    val h = graft.sources.Pages.mix(seed * 1315423911L + k)
    ((h >>> 11) & 0xfffff).toDouble / 0xfffff.toDouble
  }

  def rect(x0: Double, y0: Double, w: Double, h: Double): GPolygon =
    GPolygon(Array(GLine(Array(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, x0, y0))))

  def fixture(n: Int): IndexedSeq[GPolygon] = (0 until n).map { k =>
    val x0 = rnd(7, 4 * k) * 300
    val y0 = rnd(7, 4 * k + 1) * 300
    (k % 8: @unchecked) match {
      case 0 => // huge
        rect(x0, y0, 20 + rnd(7, 4 * k + 2) * 30, 20 + rnd(7, 4 * k + 3) * 30)
      case 1 | 2 => // long & thin (worst case for one grid cell size)
        rect(x0, y0, 60 + rnd(7, 4 * k + 2) * 120, 0.02 + rnd(7, 4 * k + 3) * 0.05)
      case _ => // tiny
        rect(x0, y0, 0.05 + rnd(7, 4 * k + 2) * 0.3, 0.05 + rnd(7, 4 * k + 3) * 0.3)
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val rects = fixture(n)
    def run(mode: Int): (Double, Long) = {
      Arrangement.noderMode = mode
      System.gc()
      val t0 = System.nanoTime()
      val out = Arrangement.unionCascaded(rects)
      val dt = (System.nanoTime() - t0) / 1000000
      (out.map(GeomOps.area).sum, dt)
    }
    run(1) // warm JIT on the grid path
    val (aGrid, tGrid) = run(1)
    run(2) // warm sweep path
    val (aSweep, tSweep) = run(2)
    Arrangement.noderMode = 0
    require(math.abs(aGrid - aSweep) <= 1e-9 * math.max(1, aGrid),
      s"mode mismatch: grid=$aGrid sweep=$aSweep")
    println(f"NODERBENCH n=$n area=$aGrid%.4f grid=${tGrid}ms sweep=${tSweep}ms " +
      f"speedup=${tGrid.toDouble / tSweep}%.2fx")
  }
}
