package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbedNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("LSH near-dup pairs achieve high recall vs the exact baseline") {
    import spark.implicits._
    // clustered vectors: 20 groups of 6 near-identical 16-d vectors
    val rows = for (g <- 0 until 20; k <- 0 until 6) yield {
      val base = Array.tabulate(16)(i =>
        (graft.sources.Pages.mix(g * 31L + i) % 1000).toFloat / 500f)
      val jit = base.zipWithIndex.map { case (v, i) =>
        v + (graft.sources.Pages.mix(g * 997L + k * 131L + i) % 100).toFloat / 4000f }
      (g * 10L + k, jit)
    }
    val df = rows.toDF("id", "vec")
    val exact = Dedup.embedNearDupExact(df, $"id", $"vec", 0.98)
      .as[(Long, Long)].collect().toSet
    assert(exact.size > 100, s"fixture must have near-dups, got ${exact.size}")
    val lsh = Dedup.embedNearDupLsh(df, $"id", $"vec", 0.98, dim = 16,
      bits = 8, probeRadius = 2)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must never emit a below-threshold pair")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
