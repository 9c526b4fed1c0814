package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style physical layout for the page table: parquet partitioned
  * by crawl day (`warc_ts` date) with rows sorted by spatial cell inside
  * each file, so that
  *  - partition pruning answers time-sliced queries without listing data
  *    files outside the slice (the analogue of Iceberg partition specs /
  *    the reference's attribute index, SURVEY.md §4 #6);
  *  - parquet row-group min/max stats on the `cell` column prune spatially
  *    selective scans (the .qix quadtree role, SURVEY.md §4 #7).
  *
  * At 10^12-document scale this is the table contract the pipeline reads;
  * at test scale the same layout is produced from the synthesized table.
  */
object PageTable {

  /** Write pages with the partitioned + cell-sorted layout.
    * Adds `ts_day` (partition column) and `cell` (sort/stats column from
    * the first text coordinate, res 7; null-safe for pages without one).
    */
  def write(pages: DataFrame, path: String, cellRes: Int = 7): Unit = {
    val withCols = pages
      .withColumn("ts_day", date_format(col("warc_ts"), "yyyy-MM-dd"))
      .withColumn("__coords", graft.gf.geo_extract(col("text")))
      .withColumn("cell",
        when(size(col("__coords")) > 0,
          graft.gf.cell_of(element_at(col("__coords"), 1).getField("lon"),
            element_at(col("__coords"), 1).getField("lat"), cellRes)))
      .drop("__coords")
    withCols
      .repartition(col("ts_day"))
      .sortWithinPartitions(col("ts_day"), col("cell"))
      .write.mode("overwrite")
      .partitionBy("ts_day")
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
