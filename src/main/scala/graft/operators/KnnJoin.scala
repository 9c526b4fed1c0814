package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gf
import graft.index.CellGrid

/** kNN join via cell-ring expansion — the distributed re-expression of the
  * reference's expanding quadtree radius search
  * (`/root/reference/gdal/alg/gdalgrid.cpp:265-385`
  * GDALGridInverseDistanceToAPowerNearestNeighbor grows its AOI until
  * nMaxPoints are found; quadtree search `gdal/port/cpl_quad_tree.cpp:682`).
  *
  * Algorithm (driver-coordinated, candidates stay distributed):
  *  1. r ← r0; candidate cells = disk(query cell, r) for every query
  *     (queries are small and broadcast; points carry one cell id).
  *  2. equi-join points to (query, cell) pairs; per query keep top-k by
  *     planar distance (window).
  *  3. correctness check: the k-th neighbor distance must be ≤ the
  *     guaranteed-covered radius of ring r (r cells in the narrower axis);
  *     queries that fail (or found < k) re-run with a doubled ring.
  *
  * The guarantee: a disk of Chebyshev radius r around the query's cell
  * covers every point within `r * min(cellW, cellH)` planar degrees of the
  * query point, so once the k-th candidate is closer than that bound no
  * uncovered point can beat it.
  */
object KnnJoin {

  /** @param points DataFrame with (idCols..., lon, lat)
    * @param queries small DataFrame with (qid, qlon, qlat)
    * @param k neighbors per query
    * @param res cell resolution for bucketing
    * @return points columns + qid + dist, exactly k rows per query (fewer
    *         if the whole dataset has < k points)
    */
  def apply(points: DataFrame, lon: Column, lat: Column,
            queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
            k: Int, res: Int, initialRing: Int = 1, maxRing: Int = 1 << 20,
            tieBreak: Seq[Column] = Nil): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val cellW = 360.0 / CellGrid.cellsPerAxis(res)
    val cellH = 180.0 / CellGrid.cellsPerAxis(res)
    val safePerRing = math.min(cellW, cellH)

    val qRows = queries.select(qid.cast("long").as("qid"),
      qlon.cast("double").as("qlon"), qlat.cast("double").as("qlat")).collect()
    require(qRows.length > 0, "knn: no queries")

    val pts = points.withColumn("__pcell", gf.cell_of(lon, lat, res))

    var pending = qRows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    var ring = initialRing
    var acc: DataFrame = null

    while (pending.nonEmpty && ring <= maxRing) {
      // (qid, cell) candidate pairs for the pending queries
      val pairs = pending.toSeq.flatMap { case (id, qx, qy) =>
        CellGrid.disk(CellGrid.cellId(qx, qy, res), ring).map(c => (id, qx, qy, c))
      }.toDF("__qid", "__qlon", "__qlat", "__qcell")

      val cand = pts.join(broadcast(pairs), pts("__pcell") === col("__qcell"))
      // plain products (not pow): bit-identical across engines for oracles
      val dist = sqrt((lon - col("__qlon")) * (lon - col("__qlon")) +
        (lat - col("__qlat")) * (lat - col("__qlat")))
      val tb = if (tieBreak.nonEmpty) tieBreak else Seq(lon, lat)
      val ranked = cand
        .withColumn("__dist", dist)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__qid")).orderBy(col("__dist") +: tb: _*)))
        .filter(col("__rn") <= k)

      val safeRadius = ring * safePerRing
      val got = ranked.groupBy(col("__qid"))
        .agg(count(lit(1)).as("__n"), max(col("__dist")).as("__maxd"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

      val done = pending.filter { case (id, _, _) =>
        got.get(id).exists { case (n, maxd) => n >= k && maxd <= safeRadius }
      }.map(_._1).toSet
      // queries still pending whose disk already spans the whole grid are done too
      val wholeGrid = ring >= CellGrid.cellsPerAxis(res)
      val doneAll = if (wholeGrid) pending.map(_._1).toSet else done

      if (doneAll.nonEmpty) {
        val part = ranked.filter(col("__qid").isin(doneAll.toSeq: _*))
          .drop("__rn", "__pcell", "__qcell", "__qlon", "__qlat")
          .withColumnRenamed("__qid", "qid")
          .withColumnRenamed("__dist", "dist")
        acc = if (acc == null) part else acc.unionByName(part)
      }
      pending = pending.filterNot { case (id, _, _) => doneAll.contains(id) }
      ring *= 2
    }
    require(pending.isEmpty, s"knn did not converge for ${pending.length} queries")
    acc
  }

  /** Exact kNN via a per-partition k-d tree (the north-star variant):
    * every partition builds a local tree once, answers all queries with
    * branch-and-bound, and the per-partition top-k lists merge globally —
    * one pass over the points, no candidate shuffle (only P×Q×k rows move).
    * Right when the query set is broadcastable; the ring-expansion variant
    * above is the path for huge query sets (it never scans points outside
    * candidate cells).
    */
  def kdTree(points: DataFrame, id: Column, lon: Column, lat: Column,
             queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
             k: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val qs = queries.select(qid.cast("long").as("qid"),
      qlon.cast("double").as("qlon"), qlat.cast("double").as("qlat"))
      .as[(Long, Double, Double)].collect()
    val qsB = spark.sparkContext.broadcast(qs)
    val pts = points.select(id.cast("long").as("id"),
      lon.cast("double").as("lon"), lat.cast("double").as("lat"))
      .as[(Long, Double, Double)]
    val partial = pts.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val tree = graft.index.KdTree.build(
          rows.map(_._2), rows.map(_._3), rows.map(_._1))
        qsB.value.iterator.flatMap { case (q, qx, qy) =>
          tree.knn(qx, qy, k).iterator.map { case (d2, pid) => (q, pid, d2) }
        }
      }
    }.toDF("qid", "pid", "__d2")
    partial
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("__d2"), col("pid"))))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("pid"), sqrt(col("__d2")).as("dist"))
  }

  /** Brute-force reference implementation (cross join + window) — the
    * oracle for the cell-ring variant and the right plan when the point
    * set is tiny.
    */
  def bruteForce(points: DataFrame, lon: Column, lat: Column,
                 queries: DataFrame, qid: Column, qlon: Column, qlat: Column,
                 k: Int): DataFrame = {
    val q = queries.select(qid.cast("long").as("qid"),
      qlon.cast("double").as("qlon"), qlat.cast("double").as("qlat"))
    val dist = sqrt((lon - col("qlon")) * (lon - col("qlon")) +
      (lat - col("qlat")) * (lat - col("qlat")))
    points.crossJoin(broadcast(q))
      .withColumn("dist", dist)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), lon, lat)))
      .filter(col("__rn") <= k)
      .drop("__rn", "qlon", "qlat")
  }
}
