package graft.operators

import graft.core.{Arrangement, GMulti, Geom}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Dissolve / cascaded n-way union (`gdal/ogr/ogrgeometry.cpp:3532`
  * OGRGeometry::UnionCascaded, GEOS CascadedUnion): merge any number of
  * (multi)polygons into the minimal set of disjoint polygons-with-holes.
  *
  * Spark shape: an algebraic [[Aggregator]] whose buffer is a bounded list
  * of WKBs — whenever the list exceeds [[Dissolve.CollapseAt]] it is
  * collapsed through the snap-rounded arrangement
  * ([[Arrangement.unionCascaded]]), so map-side partial aggregation does
  * real dissolve work and both executor memory and shuffle bytes stay
  * bounded by the collapsed representation, not the group row count.
  */
object Dissolve {

  private final val CollapseAt = 64

  private[operators] def unionWkbs(ws: Seq[Array[Byte]]): Array[Byte] = {
    val out = Arrangement.unionCascaded(ws.map(w => graft.expr.GeoRt.decode(w)))
    out match {
      case Seq() => null
      case Seq(one) => Geom.toWkb(one)
      case many => Geom.toWkb(GMulti(6, many.toArray[Geom]))
    }
  }

  final class UnionAgg extends Aggregator[Array[Byte], Seq[Array[Byte]], Array[Byte]]
      with Serializable {
    override def zero: Seq[Array[Byte]] = Seq.empty

    private def collapse(b: Seq[Array[Byte]]): Seq[Array[Byte]] =
      if (b.length < CollapseAt) b
      else Option(unionWkbs(b)).toSeq

    override def reduce(b: Seq[Array[Byte]], a: Array[Byte]): Seq[Array[Byte]] =
      if (a == null) b else collapse(b :+ a)

    override def merge(b1: Seq[Array[Byte]], b2: Seq[Array[Byte]]): Seq[Array[Byte]] =
      collapse(b1 ++ b2)

    override def finish(b: Seq[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) null else unionWkbs(b)

    override def bufferEncoder: Encoder[Seq[Array[Byte]]] =
      Encoders.kryo[Seq[Array[Byte]]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate column: ST_Union_Agg(geomWkb) → dissolved WKB. */
  def st_union_agg(g: Column): Column = udaf(new UnionAgg, Encoders.BINARY).apply(g)
}
