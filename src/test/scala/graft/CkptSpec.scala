package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Ckpt
import org.apache.spark.sql.functions._

/** Reliable-checkpoint mode: the session flag must route every Ckpt site
  * through fault-tolerant `checkpoint()` (checkpoint-dir files on disk)
  * without changing results.
  */
class CkptSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"),
    (3L, "completely different text with no overlap whatsoever in shingles"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"),
    (5L, "another unrelated document about distributed raster processing")
  ).toDF("id", "text")

  test("minhash results identical with reliable checkpointing on") {
    val off = graft.operators.Dedup.minhashPairs(docs, col("id"), col("text"),
      numHashes = 32, bands = 8, threshold = 0.5, shingle = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Ckpt.ReliableKey, "true")
    spark.conf.set(Ckpt.DirKey, dir)
    try {
      val on = graft.operators.Dedup.minhashPairs(docs, col("id"), col("text"),
        numHashes = 32, bands = 8, threshold = 0.5, shingle = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(on === off)
      // the checkpoint actually hit the reliable store
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no files in the checkpoint dir")
    } finally {
      spark.conf.set(Ckpt.ReliableKey, "false")
      spark.conf.unset(Ckpt.DirKey)
    }
  }

  test("near-dup clustering: transitive chain collapses to one cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val chain = Seq(
      (1L, base),
      (2L, base + " x"),        // ≈ doc 1
      (3L, base + " x y"),      // ≈ doc 2 (and transitively doc 1)
      (4L, "completely different text with no shingle overlap whatsoever here"))
      .toDF("id", "text")
    val got = graft.operators.Dedup.clusters(chain, col("id"), col("text"),
        numHashes = 64, bands = 16, threshold = 0.5, shingle = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("reliable mode without a dir fails loudly") {
    // fresh session state: no checkpoint dir configured on the context —
    // SparkContext keeps any dir set by the previous test, so only assert
    // when none is present
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Ckpt.ReliableKey, "true")
      try {
        val e = intercept[IllegalArgumentException] {
          Ckpt(Seq(1, 2, 3).toDS())
        }
        assert(e.getMessage.contains(Ckpt.DirKey))
      } finally spark.conf.set(Ckpt.ReliableKey, "false")
    }
  }
}
