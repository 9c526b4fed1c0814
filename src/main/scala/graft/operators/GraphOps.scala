package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators — the distributed re-expression of the reference's GNM
  * network analysis (`/root/reference/gdal/gnm/gnmgenericnetwork.cpp:800`
  * Dijkstra shortest path, `:196` ConnectedComponents) as iterative
  * DataFrame joins (Pregel-style message passing, AQE-planned).
  *
  * Scale notes: each iteration is one join + aggregate on the edge list
  * (shuffle on vertex id); `localCheckpoint` every few rounds truncates
  * the lineage so plans stay small at high iteration counts.
  */
object GraphOps {

  /** Connected components by iterative min-label propagation.
    * Converges in O(diameter) rounds.
    *
    * @param edges DataFrame with two long vertex columns (undirected)
    * @return (vertex, component) — component = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, src: Column, dst: Column,
                          maxIter: Int = 50): DataFrame = {
    val sym = edges.select(src.cast("long").as("u"), dst.cast("long").as("v"))
      .union(edges.select(dst.cast("long").as("u"), src.cast("long").as("v")))
      .distinct().cache()
    var labels = sym.select(col("u").as("vertex"))
      .union(sym.select(col("v").as("vertex"))).distinct()
      .withColumn("comp", col("vertex")).cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // candidate labels: own + min neighbor label
      val msgs = sym.join(labels, sym("v") === labels("vertex"))
        .select(col("u").as("vertex"), col("comp"))
      val newLabels = labels.select(col("vertex"), col("comp"))
        .union(msgs)
        .groupBy(col("vertex")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(eager = true)
      val changed = newLabels.alias("n")
        .join(labels.alias("o"), col("n.vertex") === col("o.vertex"))
        .filter(col("n.comp") =!= col("o.comp")).limit(1).count()
      labels.unpersist()
      labels = newLabels
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Single-source shortest paths by iterative relaxation (distributed
    * Bellman-Ford; equals Dijkstra's result on non-negative weights).
    *
    * @param edges (src, dst, weight ≥ 0); treated as directed — pass the
    *              symmetric closure for undirected networks
    * @return (vertex, dist) for reachable vertices
    */
  def shortestPaths(edges: DataFrame, src: Column, dst: Column, weight: Column,
                    sourceId: Long, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(src.cast("long").as("u"), dst.cast("long").as("v"),
      weight.cast("double").as("w")).cache()
    var dist = Seq((sourceId, 0.0)).toDF("vertex", "dist")
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val relaxed = dist.join(e, dist("vertex") === e("u"))
        .select(col("v").as("vertex"), (col("dist") + col("w")).as("dist"))
      val newDist = dist.union(relaxed)
        .groupBy(col("vertex")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = true)
      val oldCount = dist.count()
      val stats = newDist.agg(count(lit(1)), sum(col("dist"))).head()
      val oldSum = dist.agg(coalesce(sum(col("dist")), lit(0.0))).head().getDouble(0)
      converged = stats.getLong(0) == oldCount && stats.getDouble(1) == oldSum
      dist = newDist
      iter += 1
    }
    e.unpersist()
    dist
  }
}
