package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Ckpt.CkptOps

/** Distributed connected components over an edge list — the scale path for
  * the strip-boundary merges (polygonize/sieve component equivalences,
  * contour chain endpoints), replacing the driver-side union-find when the
  * pair count would not fit driver memory (worst case ~width/2 pairs per
  * strip seam on salt-and-pepper rasters).
  *
  * Algorithm: min-label propagation across edges fused with pointer
  * doubling (p ← p∘p) each round, so a component of diameter d converges in
  * O(log d) rounds rather than d. Labels are vertex ids, only ever
  * decrease, and only ever move along edges, so the detected fixpoint
  * (strictly-decreasing label sum stalls) is exactly "every vertex labeled
  * with its component minimum". Convergence detection costs one aggregate
  * per round — no driver-side materialization of the vertex set, ever.
  */
object UnionFind {

  /** @param edges DataFrame with two long columns `a`, `b`
    * @return DataFrame (gid: long, root: long) for every vertex whose
    *         component minimum differs from itself — component minima and
    *         isolated vertices are absent (same contract as the driver
    *         union-find map this replaces)
    */
  def roots(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    val sym = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val symBoth = sym.unionAll(sym.select(col("b").as("a"), col("a").as("b"))).ckpt()

    var p = symBoth.groupBy(col("a")).agg(min(col("b")).as("m"))
      .select(col("a").as("v"), least(col("a"), col("m")).as("p"))
      .ckpt()
    var prevSum = labelSum(p)
    var round = 0
    var converged = p.isEmpty
    while (!converged) {
      require(round < maxRounds,
        s"UnionFind did not converge in $maxRounds rounds — pathological input?")
      // 1. propagate: along each edge (a, b), a may adopt b's current label
      val cand = symBoth
        .join(p.select(col("v").as("__bv"), col("p").as("__pb")), col("b") === col("__bv"))
        .groupBy(col("a").as("v")).agg(min(col("__pb")).as("__c"))
      val p1 = p.join(cand, Seq("v"), "left")
        .select(col("v"), least(col("p"), coalesce(col("__c"), col("p"))).as("p"))
      // 2. pointer doubling: p(v) ← p(p(v))
      val pl = p1.select(col("v").as("__pv"), col("p").as("__pp"))
      val p2 = p1.join(pl, p1("p") === col("__pv"), "left")
        .select(p1("v").as("v"), coalesce(col("__pp"), p1("p")).as("p"))
        .ckpt()
      val s = labelSum(p2)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      p.unpersist(false)
      p = p2
      round += 1
    }
    // materialize the (much smaller) root set, then drop the symmetrized
    // edge set and the final label round — this path exists for edge sets
    // too big for a driver, so leaving them cached would pin ~2× the input
    // in executor storage for the rest of the session. Callers should
    // unpersist the returned frame when done with it.
    val out = p.filter(col("p") =!= col("v"))
      .select(col("v").as("gid"), col("p").as("root"))
      .ckpt()
    p.unpersist(false)
    symBoth.unpersist(false)
    out
  }

  /** Exact label sum (decimal(38,0) — labels only decrease, so a stalled
    * sum ⟺ no label changed; overflow-proof unlike sum(long)).
    */
  private def labelSum(p: DataFrame): java.math.BigDecimal = {
    val d = p.agg(sum(col("p").cast("decimal(38,0)"))).head.getDecimal(0)
    if (d == null) java.math.BigDecimal.ZERO else d
  }
}
