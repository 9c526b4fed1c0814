package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_overlay", "q_overlay_erase", "q_grid_moving_avg", "q_ann_cosine")) {
      val plan = graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      println(s"=== $q: ${lines.count(_.contains("Exchange"))} exchanges; " +
        s"broadcast=${lines.count(_.contains("BroadcastHashJoin"))}; " +
        s"sortmerge=${lines.count(_.contains("SortMergeJoin"))}; " +
        s"wholestage=${lines.count(_.contains("WholeStageCodegen"))}")
      lines.filter(l => l.contains("Join") || l.contains("Exchange")).take(6).foreach(l => println("   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
