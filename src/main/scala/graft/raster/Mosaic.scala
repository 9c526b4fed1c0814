package graft.raster

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.GeoTransform
import graft.raster.Dem.DStrip

/** Multi-source mosaic — `gdalwarp src1 src2 … dst` semantics
  * (`/root/reference/gdal/apps/gdalwarp_lib.cpp`: sources are warped into
  * the destination IN ORDER, each overwriting previously-written pixels
  * wherever it produces valid data; nodata/masked source pixels leave the
  * destination untouched — the classic hole-filling mosaic).
  *
  * Distribution: every source runs the normal strip warp onto the SAME dst
  * grid (so each source ships only the rows each dst strip needs), then
  * one groupBy on dst strip index composes the per-source strips in source
  * order. The compose step sees k strips per dst strip (k = #sources), not
  * pixels × sources on any single node.
  */
object Mosaic extends Serializable {

  /** One mosaic input: strips + geometry + optional pull transform and
    * source-nodata mask (see [[Warp.warp]]).
    */
  final case class Source(strips: Dataset[DStrip], srcW: Int, srcH: Int,
                          srcGt: GeoTransform,
                          tx: Warp.GeoTx = Warp.identityTx,
                          srcNoData: Option[Double] = None)

  /** Warp every source to `dst` and compose in order (later wins where
    * valid). `noData` is both the fill for uncovered pixels and the
    * validity sentinel between sources — a genuine data value equal to it
    * is treated as transparent, exactly the reference's nodata caveat.
    * Deliberately NO default: the sentinel decides which pixels of a later
    * source overwrite, so it must be a value the data cannot take (a
    * default of 0.0 would silently make every genuine zero transparent).
    */
  def apply(spark: SparkSession, sources: Seq[Source], dst: Warp.DstSpec,
            kernel: Warp.Kernel = Warp.Nearest, noData: Double,
            approxTol: Double = 0.0): Dataset[DStrip] = {
    import spark.implicits._
    require(sources.nonEmpty, "mosaic: no sources")
    val nd = noData
    val warped = sources.zipWithIndex.map { case (s, i) =>
      Warp.warp(spark, s.strips, s.srcW, s.srcH, s.srcGt, dst, s.tx,
          kernel, nd, approxTol, s.srcNoData)
        .map(st => (i, st))
    }
    warped.reduce(_ union _)
      .groupByKey(_._2.stripIdx)
      .mapGroups { (_, it) =>
        val inOrder = it.toArray.sortBy(_._1)
        val base = inOrder.head._2
        val out = base.vals.clone()
        var k = 1
        while (k < inOrder.length) {
          val vals = inOrder(k)._2.vals
          var i = 0
          while (i < out.length) {
            if (vals(i) != nd) out(i) = vals(i)
            i += 1
          }
          k += 1
        }
        DStrip(base.stripIdx, base.yOff, base.height, out)
      }
  }
}
