package graft
import graft.core.GeoTransform
import graft.raster.{Dem, Warp}
object WarpApproxBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val sw = 2048; val sh = 1024
    val vals = Array.tabulate(sw * sh)(i => ((i % sw) * 31 + (i / sw) * 17) % 23 * 1.0)
    val srcGt = GeoTransform.northUp(3.0, 50.0, 0.002, 0.004)
    val dstGt = GeoTransform.northUp(500000.0, 5530000.0, 150.0, 220.0)
    val strips = (0 until sh by 128).zipWithIndex.map { case (y0, idx) =>
      Dem.DStrip(idx, y0, 128, java.util.Arrays.copyOfRange(vals, y0 * sw, (y0 + 128) * sw))
    }.toDS().cache()
    strips.count()
    val spec = Warp.DstSpec(1900, 1000, dstGt, stripHeight = 128)
    val tx = Warp.epsgTx(32631, 4326)
    def run(tol: Double): Double = {
      val t0 = System.nanoTime()
      Warp.warp(spark, strips, sw, sh, srcGt, spec, tx,
        kernel = Warp.Bilinear, noData = -1, approxTol = tol)
        .foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    run(0); run(0.125) // warm both paths
    val exact = (1 to 3).map(_ => run(0)).min
    val approx = (1 to 3).map(_ => run(0.125)).min
    println(f"WARPBENCH exact=$exact%.2f s approx=$approx%.2f s speedup=${exact / approx}%.2fx (1.9Mpx UTM bilinear)")
  }
}
