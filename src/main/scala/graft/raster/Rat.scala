package graft.raster

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.raster.Overview.IStrip

/** Raster attribute tables — `/root/reference/gdal/gcore/gdal_rat.cpp`
  * (GDALRasterAttributeTable / GDALDefaultRasterAttributeTable): per-value
  * (or per-bin) attribute rows with typed, usage-tagged columns, PAM XML
  * serialization (`gdal_rat.cpp:518` Serialize / `:715` XMLInit), linear
  * binning (`GetLinearBinning`), and `GetRowOfValue` lookup.
  *
  * The table itself is driver-sized (the reference holds it fully in
  * memory as dataset metadata); what distributes here is everything that
  * TOUCHES pixels: building a histogram RAT is one groupBy over the strips
  * and classifying pixels through a RAT column is a broadcast remap —
  * never a per-pixel driver loop.
  */
object Rat extends Serializable {

  // GDALRATFieldType (gdal.h)
  val GFT_Integer = 0; val GFT_Real = 1; val GFT_String = 2
  // GDALRATFieldUsage (gdal.h declaration order)
  val GFU_Generic = 0; val GFU_PixelCount = 1; val GFU_Name = 2
  val GFU_Min = 3; val GFU_Max = 4; val GFU_MinMax = 5
  val GFU_Red = 6; val GFU_Green = 7; val GFU_Blue = 8; val GFU_Alpha = 9

  final case class Field(name: String, ftype: Int, usage: Int)

  /** Rows are stored as strings and converted on access, like the
    * reference's discrete column arrays behind GetValueAs*.
    */
  final case class Table(fields: Vector[Field], rows: Vector[Vector[String]],
                         row0Min: Option[Double] = None,
                         binSize: Option[Double] = None) {
    def columnCount: Int = fields.length
    def rowCount: Int = rows.length
    def colIndex(usage: Int): Int = fields.indexWhere(_.usage == usage)

    def valueInt(row: Int, col: Int): Int = math.round(valueDouble(row, col)).toInt
    def valueDouble(row: Int, col: Int): Double = rows(row)(col).toDouble
    def valueString(row: Int, col: Int): String = rows(row)(col)

    /** GetRowOfValue (`gdal_rat.cpp:195`): linear binning when present,
      * else the MinMax (categorical value) column, else Min/Max range.
      */
    def rowOfValue(v: Double): Int = (row0Min, binSize) match {
      case (Some(r0), Some(bs)) if bs != 0 =>
        val r = math.floor((v - r0) / bs).toInt
        if (r < 0 || r >= rowCount) -1 else r
      case _ =>
        val vCol = colIndex(GFU_MinMax)
        if (vCol >= 0) rows.indexWhere(r => r(vCol).toDouble == v)
        else {
          val lo = colIndex(GFU_Min); val hi = colIndex(GFU_Max)
          if (lo < 0 || hi < 0) -1
          else rows.indexWhere(r => v >= r(lo).toDouble && v < r(hi).toDouble)
        }
    }

    /** PAM XML (`gdal_rat.cpp:518`): Row0Min/BinSize attributes, FieldDefn
      * index/Name/Type/Usage, Row index + one F element per column.
      */
    def toXml: String = {
      val sb = new StringBuilder
      def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;").replace("\"", "&quot;")
      sb ++= "<GDALRasterAttributeTable"
      (row0Min, binSize) match {
        case (Some(r0), Some(bs)) =>
          // Locale.ROOT: comma-decimal default locales would break the
          // round trip (and GDAL interop) via %.16g
          sb ++= String.format(java.util.Locale.ROOT,
            " Row0Min=\"%.16g\" BinSize=\"%.16g\"",
            Double.box(r0), Double.box(bs))
        case _ => ()
      }
      sb ++= ">\n"
      fields.zipWithIndex.foreach { case (f, i) =>
        sb ++= s"""  <FieldDefn index="$i">\n"""
        sb ++= s"    <Name>${esc(f.name)}</Name>\n"
        sb ++= s"    <Type>${f.ftype}</Type>\n"
        sb ++= s"    <Usage>${f.usage}</Usage>\n"
        sb ++= "  </FieldDefn>\n"
      }
      rows.zipWithIndex.foreach { case (r, i) =>
        sb ++= s"""  <Row index="$i">\n"""
        r.foreach(v => sb ++= s"    <F>${esc(v)}</F>\n")
        sb ++= "  </Row>\n"
      }
      sb ++= "</GDALRasterAttributeTable>\n"
      sb.toString
    }
  }

  /** Parse the PAM XML form (inverse of [[Table.toXml]]). */
  def fromXml(xml: String): Table = {
    val root = scala.xml.XML.loadString(xml)
    require(root.label == "GDALRasterAttributeTable", s"unexpected root ${root.label}")
    val r0 = (root \ "@Row0Min").headOption.map(_.text.toDouble)
    val bs = (root \ "@BinSize").headOption.map(_.text.toDouble)
    val fields = (root \ "FieldDefn").sortBy(n => (n \ "@index").text.toInt).map { fd =>
      Field((fd \ "Name").text, (fd \ "Type").text.toInt, (fd \ "Usage").text.toInt)
    }.toVector
    val rows = (root \ "Row").sortBy(n => (n \ "@index").text.toInt).map { rn =>
      (rn \ "F").map(_.text).toVector
    }.toVector
    rows.foreach(r => require(r.length == fields.length, "row arity != field count"))
    Table(fields, rows, r0, bs)
  }

  /** Build the classic thematic RAT (VALUE + COUNT) from raster strips:
    * one distributed groupBy, rows sorted by value. The distinct-value set
    * must be table-sized — `maxRows` guards against continuous rasters.
    */
  def fromRasterHistogram(spark: SparkSession, strips: Dataset[IStrip],
                          maxRows: Int = 65536): Table = {
    import spark.implicits._
    val counts = strips.flatMap { s =>
      // per-strip pre-aggregation: one (value, count) pair per distinct
      // value per strip reaches the shuffle, not one row per pixel
      val m = new scala.collection.mutable.HashMap[Int, Long]
      var i = 0
      while (i < s.vals.length) { m.update(s.vals(i), m.getOrElse(s.vals(i), 0L) + 1L); i += 1 }
      m.iterator
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (v, n) => (v, n) }
    // one job: take(maxRows+1) both enforces the guard and fetches the rows
    val taken = counts.take(maxRows + 1)
    require(taken.length <= maxRows,
      s"RAT would have > $maxRows rows — thematic RATs are per-value tables; bin first")
    val rows = taken.sortBy(_._1)
      .map { case (v, c) => Vector(v.toString, c.toString) }.toVector
    Table(Vector(Field("VALUE", GFT_Integer, GFU_MinMax),
      Field("COUNT", GFT_Integer, GFU_PixelCount)), rows)
  }

  /** Classify pixels through a RAT column: each pixel value is looked up
    * with `rowOfValue` and replaced by the integer value of `targetField`
    * (missing rows → `noMatch`). Broadcast remap, strip-parallel.
    */
  def classify(spark: SparkSession, strips: Dataset[IStrip], rat: Table,
               targetField: String, noMatch: Int = 0): Dataset[IStrip] = {
    import spark.implicits._
    val tCol = rat.fields.indexWhere(_.name == targetField)
    require(tCol >= 0, s"RAT has no field '$targetField'")
    val ratB = spark.sparkContext.broadcast(rat)
    strips.map { s =>
      val t = ratB.value
      // per-strip memo: rowOfValue is a scan for categorical tables
      val memo = new scala.collection.mutable.HashMap[Int, Int]
      val out = new Array[Int](s.vals.length)
      var i = 0
      while (i < s.vals.length) {
        val v = s.vals(i)
        out(i) = memo.getOrElseUpdate(v, {
          val r = t.rowOfValue(v.toDouble)
          if (r < 0) noMatch else t.valueInt(r, tCol)
        })
        i += 1
      }
      s.copy(vals = out)
    }
  }
}
