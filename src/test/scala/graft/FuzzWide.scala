package graft
import graft.core._

/** Wide randomized sweep over the arrangement engine, beyond the committed
  * ArrangementFuzzSpec seeds: 500 star-pair overlays checked against the
  * inclusion-exclusion identities + 150 n-way star dissolves checked for
  * area bounds and idempotence. Run ad hoc between rounds:
  * `sbt -batch "Test/runMain graft.FuzzWide"` — prints `bad=0/500 bad2=0/150`
  * when healthy.
  */
object FuzzWide {
  def rnd(seed: Long, k: Int): Double = {
    val h = graft.sources.Pages.mix(seed * 1315423911L + k)
    ((h >>> 11) & 0xfffff).toDouble / 0xfffff.toDouble
  }
  def star(seed: Long, cx: Double, cy: Double): GPolygon = {
    val nv = 5 + (graft.sources.Pages.mix(seed) & 15).toInt
    val pts = (0 until nv).flatMap { k =>
      val r = 0.3 + rnd(seed, k) * 8
      val a = 2 * math.Pi * k / nv
      Seq(cx + r * math.cos(a), cy + r * math.sin(a))
    }.toArray
    GPolygon(Array(GLine(pts ++ Array(pts(0), pts(1)))))
  }
  def main(args: Array[String]): Unit = {
    // `sweep` forces the Bentley–Ottmann-style enumerator for every
    // fixture (they're below the auto threshold), `grid` forces the
    // uniform grid; default exercises the production auto dispatch.
    args.headOption match {
      case Some("sweep") => Arrangement.noderMode = 2
      case Some("grid")  => Arrangement.noderMode = 1
      case _             => ()
    }
    var bad = 0
    for (seed <- 1 to 500) {
      val a = star(seed * 2 + 1, 0, 0)
      val b = star(seed * 2 + 2, rnd(seed, 99) * 8 - 4, rnd(seed, 98) * 8 - 4)
      val aA = GeomOps.area(a); val aB = GeomOps.area(b)
      try {
        val un = Arrangement.overlay2(a, b, 1).map(GeomOps.area).sum
        val in = Arrangement.overlay2(a, b, 0).map(GeomOps.area).sum
        val di = Arrangement.overlay2(a, b, 2).map(GeomOps.area).sum
        val tol = 2e-5 * math.max(1, aA + aB)
        if (math.abs((un + in) - (aA + aB)) > tol ||
            math.abs(di - (aA - in)) > tol ||
            in < -tol || in > math.min(aA, aB) + tol) {
          bad += 1
          println(f"BAD seed=$seed aA=$aA%.6f aB=$aB%.6f un=$un%.6f in=$in%.6f di=$di%.6f")
        }
      } catch { case e: Throwable =>
        bad += 1; println(s"THROW seed=$seed: ${e.getMessage}")
      }
    }
    // n-way star dissolve: bounds + idempotence
    var bad2 = 0
    for (seed <- 1 to 150) {
      val n = 3 + (seed % 6)
      val stars = (0 until n).map(k =>
        star(seed * 31 + k, rnd(seed, 50 + k) * 12 - 6, rnd(seed, 70 + k) * 12 - 6))
      try {
        val d1 = Arrangement.unionCascaded(stars)
        val a1 = d1.map(GeomOps.area).sum
        val d2 = Arrangement.unionCascaded(d1)
        val a2 = d2.map(GeomOps.area).sum
        val amax = stars.map(GeomOps.area).max
        val asum = stars.map(GeomOps.area).sum
        val tol = 2e-5 * math.max(1, asum)
        if (a1 < amax - tol || a1 > asum + tol || math.abs(a2 - a1) > tol) {
          bad2 += 1
          println(f"BAD2 seed=$seed a1=$a1%.6f a2=$a2%.6f amax=$amax%.6f asum=$asum%.6f")
        }
      } catch { case e: Throwable =>
        bad2 += 1; println(s"THROW2 seed=$seed: ${e.getMessage}")
      }
    }
    println(s"FUZZWIDE done, bad=$bad/500 bad2=$bad2/150")
  }
}
