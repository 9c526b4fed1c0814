package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.jobs.Pipeline
import graft.sources.Pages

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def zones = Pages.zones(12).toDF("zone_id", "wkt")
    .withColumn("geom", gf.st_geomfromtext($"wkt")).select($"zone_id", $"geom")

  test("pipeline resumes from lineage after injected failure; output identical") {
    val pages = Pages.synth(spark, 4000L).cache()
    val dirA = java.nio.file.Files.createTempDirectory("graft-pipe-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-pipe-b").toString

    // reference run: straight through
    val cfgA = Pipeline.Config(outDir = dirA, nBatches = 4)
    val resA = Pipeline.run(spark, pages, zones, cfgA)
    assert(resA.size === 4)

    // failing run: dies after 2 committed batches, then resumes
    val cfgB = Pipeline.Config(outDir = dirB, nBatches = 4, failAfterBatch = 1)
    intercept[RuntimeException] { Pipeline.run(spark, pages, zones, cfgB) }
    val done = Pipeline.committedBatches(spark, cfgB)
    assert(done.size === 2, s"expected 2 committed batches, got $done")
    val resB = Pipeline.run(spark, pages, zones, cfgB.copy(failAfterBatch = -1))
    assert(resB.size === 2) // only the remaining batches ran
    assert(Pipeline.committedBatches(spark, cfgB).size === 4)

    // identical results either way
    def canon(dir: String) =
      Pipeline.output(spark, Pipeline.Config(outDir = dir, nBatches = 4))
        .select($"url", $"mention_idx", $"zone_id", $"cell", $"tile_x", $"tile_y")
        .as[(String, Int, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(canon(dirB) === canon(dirA))
    assert(canon(dirA).nonEmpty)

    // per-row invariant: byte-identical text per url vs the input
    val out = Pipeline.output(spark, cfgA)
    val bad = out.select($"url", $"text").distinct()
      .join(pages.select($"url", $"text".as("orig")), "url")
      .filter($"text" =!= $"orig")
    assert(bad.count() === 0, "text column was rewritten somewhere")
    pages.unpersist()
  }

  test("mid-batch kill resumes at partition granularity; committed parts untouched") {
    val pages = Pages.synth(spark, 4000L).cache()
    val dirA = java.nio.file.Files.createTempDirectory("graft-pipe-pa").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-pipe-pb").toString

    val cfgA = Pipeline.Config(outDir = dirA, nBatches = 2, nParts = 16)
    Pipeline.run(spark, pages, zones, cfgA)

    // kill INSIDE the first batch after 5 partition commits
    graft.jobs.PartKill.committed.set(0)
    val cfgB = Pipeline.Config(outDir = dirB, nBatches = 2, nParts = 16,
      failAfterParts = 5)
    intercept[org.apache.spark.SparkException] {
      Pipeline.run(spark, pages, zones, cfgB)
    }
    assert(Pipeline.committedBatches(spark, cfgB).isEmpty, "no batch record yet")
    val partsDone = Pipeline.committedParts(spark, cfgB, 0)
    assert(partsDone.size >= 5, s"expected >=5 committed parts, got $partsDone")
    assert(partsDone.size < 16, "kill should leave some partitions uncommitted")

    // committed partition files must survive the restart untouched
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def mtimes(): Map[String, Long] = partsDone.toSeq.map { p =>
      val f = new org.apache.hadoop.fs.Path(s"$dirB/batch=0/part-$p.parquet")
      (f.getName, fs.getFileStatus(f).getModificationTime)
    }.toMap
    val before = mtimes()

    graft.jobs.PartKill.committed.set(0)
    Pipeline.run(spark, pages, zones, cfgB.copy(failAfterParts = -1))
    assert(Pipeline.committedBatches(spark, cfgB).size === 2)
    assert(mtimes() === before, "restart rewrote already-committed partitions")

    def canon(dir: String) =
      Pipeline.output(spark, Pipeline.Config(outDir = dir, nBatches = 2))
        .select($"url", $"mention_idx", $"zone_id", $"cell", $"tile_x", $"tile_y")
        .as[(String, Int, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(canon(dirB) === canon(dirA))
    assert(canon(dirB).nonEmpty)
    // timestamps/text round-trip through the task-written parquet intact
    val out = Pipeline.output(spark, cfgB)
    val bad = out.select($"url", $"warc_ts", $"text").distinct()
      .join(pages.select($"url", $"warc_ts".as("ots"), $"text".as("orig")), "url")
      .filter($"text" =!= $"orig" || $"warc_ts" =!= $"ots")
    assert(bad.count() === 0, "text/warc_ts changed through task-committed parquet")
    pages.unpersist()
  }

  test("file-batched runOnPath: one scan of the input, same rows, resumable") {
    val pages = Pages.synth(spark, 3000L)
    val inDir = java.nio.file.Files.createTempDirectory("graft-pipe-in").toString
    pages.repartition(8).write.mode("overwrite").parquet(inDir)

    val dirH = java.nio.file.Files.createTempDirectory("graft-pipe-h").toString
    val dirF = java.nio.file.Files.createTempDirectory("graft-pipe-f").toString
    val cfgH = Pipeline.Config(outDir = dirH, nBatches = 3)
    val cfgF = Pipeline.Config(outDir = dirF, nBatches = 3)
    Pipeline.run(spark, spark.read.parquet(inDir), zones, cfgH)
    // failing file-batched run, then resume
    intercept[RuntimeException] {
      Pipeline.runOnPath(spark, inDir, zones, cfgF.copy(failAfterBatch = 0))
    }
    assert(Pipeline.committedBatches(spark, cfgF).size === 1)
    val res = Pipeline.runOnPath(spark, inDir, zones, cfgF)
    assert(res.size === 2)

    def canon(dir: String) =
      Pipeline.output(spark, Pipeline.Config(outDir = dir, nBatches = 3))
        .select($"url", $"mention_idx", $"zone_id", $"cell")
        .as[(String, Int, Long, Long)].collect().sorted.toSeq
    assert(canon(dirF) === canon(dirH))
    assert(canon(dirF).nonEmpty)
    // lineage in-counts cover every input page exactly once across batches
    val totIn = Pipeline.committedBatches(spark, cfgF) // 3 batches committed
    assert(totIn.size === 3)
  }
}
