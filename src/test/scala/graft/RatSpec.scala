package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.Rat
import graft.raster.Rat.{Field, Table}
import graft.raster.Overview.IStrip

/** Raster attribute tables: XML round trip, rowOfValue semantics,
  * histogram build, classify remap.
  */
class RatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("PAM XML round trip preserves fields, rows, and binning") {
    val t = Table(
      Vector(Field("VALUE", Rat.GFT_Real, Rat.GFU_MinMax),
             Field("NAME", Rat.GFT_String, Rat.GFU_Name),
             Field("COUNT", Rat.GFT_Integer, Rat.GFU_PixelCount)),
      Vector(Vector("1.5", "water & <deep>", "42"),
             Vector("2.5", "forest", "17")),
      row0Min = Some(1.0), binSize = Some(1.0))
    val back = Rat.fromXml(t.toXml)
    assert(back.fields === t.fields)
    assert(back.rows === t.rows)
    assert(back.row0Min.get === 1.0 && back.binSize.get === 1.0)
    assert(back.valueString(0, 1) === "water & <deep>")
  }

  test("rowOfValue: linear binning, categorical, and min/max range") {
    val binned = Table(Vector(Field("COUNT", Rat.GFT_Integer, Rat.GFU_PixelCount)),
      Vector(Vector("1"), Vector("2"), Vector("3")),
      row0Min = Some(10.0), binSize = Some(5.0))
    assert(binned.rowOfValue(10.0) === 0)
    assert(binned.rowOfValue(14.9) === 0)
    assert(binned.rowOfValue(22.0) === 2)
    assert(binned.rowOfValue(9.9) === -1)
    assert(binned.rowOfValue(25.0) === -1)

    val cat = Table(Vector(Field("VALUE", Rat.GFT_Integer, Rat.GFU_MinMax)),
      Vector(Vector("7"), Vector("9")))
    assert(cat.rowOfValue(9.0) === 1)
    assert(cat.rowOfValue(8.0) === -1)

    val range = Table(
      Vector(Field("MIN", Rat.GFT_Real, Rat.GFU_Min), Field("MAX", Rat.GFT_Real, Rat.GFU_Max)),
      Vector(Vector("0", "10"), Vector("10", "20")))
    assert(range.rowOfValue(5.0) === 0)
    assert(range.rowOfValue(10.0) === 1) // half-open [min, max)
    assert(range.rowOfValue(25.0) === -1)
  }

  test("histogram RAT and classify over strips") {
    val w = 10; val h = 6
    val vals = Array.tabulate(w * h)(i => i % 4)
    val strips = (0 until h by 2).zipWithIndex.map { case (y0, i) =>
      IStrip(i, y0, 2, w, java.util.Arrays.copyOfRange(vals, y0 * w, (y0 + 2) * w))
    }.toDS()
    val rat = Rat.fromRasterHistogram(spark, strips)
    assert(rat.rowCount === 4)
    assert((0 until 4).forall(r => rat.valueInt(r, 1) === 15))
    assert(rat.colIndex(Rat.GFU_PixelCount) === 1)

    val cls = Table(
      Vector(Field("VALUE", Rat.GFT_Integer, Rat.GFU_MinMax),
             Field("CLASS", Rat.GFT_Integer, Rat.GFU_Generic)),
      Vector(Vector("0", "100"), Vector("1", "200"), Vector("3", "400")))
    val out = Rat.classify(spark, strips, cls, "CLASS", noMatch = -1)
      .collect().sortBy(_.yOff).flatMap(_.vals)
    assert(out.toSeq === vals.map(v => Map(0 -> 100, 1 -> 200, 3 -> 400).getOrElse(v, -1)).toSeq)

    // row-count guard
    val wide = (0 until 1).map(i => IStrip(i, 0, 1, 100, Array.tabulate(100)(identity))).toDS()
    intercept[IllegalArgumentException](Rat.fromRasterHistogram(spark, wide, maxRows = 50))
  }
}
