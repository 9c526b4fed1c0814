package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Pages, PageTable}

class PageTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("partitioned layout prunes by day and preserves every page") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pagetable").toString
    val pages = Pages.synth(spark, 3000L).cache()
    PageTable.write(pages, dir)

    val back = PageTable.read(spark, dir)
    assert(back.count() === 3000L)
    // text round-trips byte-identically (the per-row invariant)
    val joined = back.select($"url", $"text".as("t2"))
      .join(pages.select($"url", $"text"), "url")
      .filter($"t2" =!= $"text")
    assert(joined.count() === 0)

    // a day-sliced query scans only matching partitions
    val days = back.select($"ts_day").distinct().as[String].collect().sorted
    assert(days.length > 1, "expect multiple day partitions")
    val q = back.filter($"ts_day" === days.head)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(q.count() > 0)
    val firstDayFiles = q.select(input_file_name()).distinct().as[String].collect()
    assert(firstDayFiles.forall(_.contains(s"ts_day=${days.head}")),
      "scan touched files outside the pruned partition")
    pages.unpersist()
  }
}
