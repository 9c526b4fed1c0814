package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OGR SQL dialect semantics that differ from standard SQL, pinned as
  * explicit helpers so the divergences never leak into the general engine
  * (`/root/reference/gdal/ogr/ogr_sql.dox`).
  */
object OgrSql {

  /** OGR SQL AVG over DATETIME (`/root/reference/gdal/ogr/swq.cpp:430-450`):
    * values sum as Unix seconds INCLUDING the fractional second, and the
    * average renders back as an OGR datetime string (YYYY/MM/DD HH:MM:SS,
    * seconds truncated like the integer cast in the reference's formatter).
    */
  def avgDatetime(ts: Column): Column =
    date_format(
      // toward-zero truncation (plain long cast), matching the reference
      // formatter's integer cast — floor() would differ by 1 s for
      // pre-1970 (negative-epoch) averages
      timestamp_seconds(avg(
        ts.cast("timestamp").cast("double")).cast("long")), // NTZ → epoch via session TZ
      "yyyy/MM/dd HH:mm:ss")

  /** OGR_STYLE special field (`gdal/ogr/ogrfeaturequery.cpp:45`): the
    * feature style string; data sources without style metadata return
    * NULL, which is the case for every source this engine reads — the
    * field exists for SQL-surface completeness.
    */
  def ogrStyle(df: DataFrame, styleCol: Option[Column] = None): Column =
    styleCol.getOrElse(lit(null).cast("string")).as("OGR_STYLE")

  /** OGR LEFT JOIN: exactly ONE output row per primary row, joined fields
    * from the FIRST matching secondary row, NULLs when none
    * (`ogr_sql.dox:455-461` "not true LEFT or RIGHT joins";
    * exec `ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1256-1306`).
    *
    * @param primaryKey a unique key of `primary` (the FID)
    * @param firstBy ordering that defines "first match" in the secondary
    *        (the reference uses the secondary layer's read order = FID)
    */
  def firstMatchLeftJoin(primary: DataFrame, secondary: DataFrame,
                         cond: Column, primaryKey: Column,
                         firstBy: Column): DataFrame = {
    val joined = primary.join(secondary, cond, "left")
    joined.withColumn("__rn",
        row_number().over(Window.partitionBy(primaryKey).orderBy(firstBy.asc_nulls_last)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** OGR DISTINCT mode: single-column distinct list, sorted with NULLs
    * first (`ogr/swq.cpp:545-585`; mode SWQM_DISTINCT_LIST `swq.h:256`).
    */
  def distinctList(df: DataFrame, c: Column, desc: Boolean = false): DataFrame = {
    val d = df.select(c).distinct()
    if (desc) d.orderBy(c.desc_nulls_first) else d.orderBy(c.asc_nulls_first)
  }

  /** UNION ALL with schema-superset semantics (`ogr_sql.dox:476-483`;
    * exec `ogr/ogrsf_frmts/generic/ogrunionlayer.cpp:682`).
    */
  def unionAll(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}
