package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans of key queries for plan-shape review:
  * pushdown reaching the parquet scan, broadcast joins where expected,
  * wide WholeStageCodegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_spatial_join", "q_knn", "q_cell_of", "q_filter_pred",
        "q_left_join_first", "q_dedup_minhash", "q_ann_cosine")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
