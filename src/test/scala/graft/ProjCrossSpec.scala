package graft

import graft.core.Proj
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validates the Scala CRS engine (Snyder formulations) against the
  * independent Python port in tools/gen_proj_oracle.py (PROJ.4-style
  * Evenden series for TMerc, independently coded LCC/stereo/LAEA/Helmert).
  * Agreement below 0.1 mm on every registered pair is strong evidence both
  * transcriptions are correct. Skips if python3 is unavailable.
  */
class ProjCrossSpec extends AnyFunSuite {

  private def scalaRows(): Seq[(Int, Int, Double, Double)] = {
    val pts = Seq(
      (1, 32631, 2.3522, 48.8566), (2, 32631, 5.37, 43.30),
      (3, 32631, 0.1278, 51.5074), (4, 32733, 13.23, -8.83),
      (5, 32733, 17.08, -22.57), (6, 25832, 8.68, 50.11),
      (7, 27700, -0.1276, 51.5072), (8, 27700, -3.1883, 55.9533),
      (9, 2154, 2.3522, 48.8566), (10, 2154, -1.5536, 47.2184),
      (11, 3413, -45.0, 70.0), (12, 3413, -30.0, 78.0),
      (13, 3031, 0.0, -75.0), (14, 3031, 166.67, -77.85),
      (15, 5041, 10.0, 85.0), (16, 3035, 10.0, 52.0),
      (17, 3035, -3.70, 40.42), (20, 5070, -96.0, 35.0),
      (21, 5070, -118.24, 34.05))
    val p2p = Seq(
      (18, 32631, 2154, 652000.0, 5420000.0),
      (19, 27700, 4326, 530000.0, 180000.0))
    val g = Proj.byEpsg(4326).get
    pts.map { case (pid, dst, lon, lat) =>
      val (x, y) = Proj.transformPoint(g, Proj.byEpsg(dst).get, lon, lat)
      (pid, dst, x, y)
    } ++ p2p.map { case (pid, src, dst, x0, y0) =>
      val (x, y) = Proj.transformPoint(Proj.byEpsg(src).get, Proj.byEpsg(dst).get, x0, y0)
      (pid, dst, x, y)
    }
  }

  test("Scala Snyder kernels agree with independent PROJ.4-style Python port") {
    val py = try {
      val p = new ProcessBuilder("python3", "tools/gen_proj_oracle.py", "--tsv")
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      if (p.waitFor() != 0) { cancel("python3 oracle failed: " + out.take(3).mkString(" | ")) }
      out
    } catch { case _: java.io.IOException => cancel("python3 not available") }

    val pyRows = py.map { line =>
      val f = line.split("\t")
      (f(0).toInt, f(1).toInt, f(2).toDouble, f(3).toDouble)
    }.sortBy(_._1)
    val sc = scalaRows().sortBy(_._1)
    assert(pyRows.length === sc.length)
    pyRows.zip(sc).foreach { case ((pid, de, px, py1), (_, _, sx, sy)) =>
      // geographic outputs compare in degrees (1e-9 deg ≈ 0.1 mm);
      // projected outputs in meters
      val tol = if (de == 4326) 1e-8 else 1e-4
      assert(math.abs(px - sx) < tol && math.abs(py1 - sy) < tol,
        s"pid $pid epsg $de: python ($px,$py1) vs scala ($sx,$sy)")
    }
  }
}
