package graft.operators

import graft.core.Ckpt.CkptOps
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
    val n = CellGrid.cellsPerAxis(res)
    val cellW = 360.0 / n
    val cellH = 180.0 / n
    val safePerRing = math.min(cellW, cellH)

    val pts = points.withColumn("__pcell", gf.cell_of(lon, lat, res))

    // DataFrame-driven iteration: the pending query set stays distributed;
    // the only per-round driver value is its count. Converged queries leave
    // via an anti-join; rounds double the candidate ring.
    var pending = queries.select(qid.cast("long").as("__qid"),
        qlon.cast("double").as("__qlon"), qlat.cast("double").as("__qlat"))
      .ckpt()
    var nPending = pending.count()
    require(nPending > 0, "knn: no queries")
    var ring = initialRing
    var acc: DataFrame = null
    val roundCaches = Seq.newBuilder[DataFrame]

    while (nPending > 0) {
      // once the disk spans the grid (or the caller's ring budget is
      // exhausted) stop pruning and brute-force the remaining stragglers —
      // the loop then ALWAYS terminates with every query answered, with
      // fewer than k rows when the whole dataset has fewer than k points
      // (the old ring<=maxRing guard instead threw 'did not converge' on
      // an empty points side, or whenever res made n exceed maxRing)
      val wholeGrid = ring >= n || ring > maxRing
      if (wholeGrid && ring < n)
        // a small user-supplied maxRing degrades to a full scan of the
        // points side per straggler — loud, mirroring kShortestPaths
        System.err.println(s"knn: maxRing=$maxRing exhausted at ring=$ring " +
          s"before convergence — brute-force sweep over ALL points for " +
          s"$nPending remaining queries (raise maxRing to keep pruning)")
      // candidate cells of the disk: explode dx/dy, wrap x, clamp y —
      // mirror of CellGrid.disk as pure column arithmetic
      def diskPairs = pending
        .withColumn("__cx", least(greatest(
          floor((col("__qlon") + 180.0) / 360.0 * n), lit(0.0)), lit((n - 1).toDouble)).cast("long"))
        .withColumn("__cy", least(greatest(
          floor((col("__qlat") + 90.0) / 180.0 * n), lit(0.0)), lit((n - 1).toDouble)).cast("long"))
        .withColumn("__dx", explode(sequence(lit(-ring), lit(ring))))
        .withColumn("__dy", explode(sequence(lit(-ring), lit(ring))))
        .withColumn("__ny", col("__cy") + col("__dy"))
        .filter(col("__ny") >= 0 && col("__ny") < n)
        .withColumn("__qcell",
          lit(res.toLong << 52) + pmod(col("__cx") + col("__dx"), lit(n)) * (1L << 26) + col("__ny"))
        .select(col("__qid"), col("__qlon"), col("__qlat"), col("__qcell"))
      // longitude wrap can alias distinct dx to the same cell once the
      // ring spans the grid — dedupe only then (extra shuffle otherwise)
      def pairsDeduped =
        if (2L * ring + 1 > n) diskPairs.dropDuplicates("__qid", "__qcell") else diskPairs

      val cand =
        if (wholeGrid) pts.crossJoin(pending) // exact final sweep
        else pts.join(pairsDeduped, pts("__pcell") === col("__qcell"))
      // plain products (not pow): bit-identical across engines for oracles
      val dist = sqrt((lon - col("__qlon")) * (lon - col("__qlon")) +
        (lat - col("__qlat")) * (lat - col("__qlat")))
      val tb = if (tieBreak.nonEmpty) tieBreak else Seq(lon, lat)
      val ranked = cand
        .withColumn("__dist", dist)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__qid")).orderBy(col("__dist") +: tb: _*)))
        .filter(col("__rn") <= k)
        .persist() // reused for convergence stats AND output (lazy: the
                   // pending count below populates it in the same job wave)
      roundCaches += ranked

      val safeRadius = ring * safePerRing
      // a query is done when its k-th candidate provably cannot be beaten
      // by a point in an unsearched cell; on the brute-force sweep EVERY
      // pending query is done (including ones with zero candidates)
      val doneQ =
        if (wholeGrid) pending.select(col("__qid"))
        else ranked.groupBy(col("__qid"))
          .agg(count(lit(1)).as("__n"), max(col("__dist")).as("__maxd"))
          .filter(col("__n") >= k && col("__maxd") <= safeRadius)
          .select(col("__qid"))

      val part = ranked.join(doneQ.withColumnRenamed("__qid", "__dqid"),
          col("__qid") === col("__dqid"), "leftsemi")
        .drop("__rn", "__pcell", "__qcell", "__qlon", "__qlat")
        .withColumnRenamed("__qid", "qid")
        .withColumnRenamed("__dist", "dist")
      acc = if (acc == null) part else acc.unionByName(part)

      pending = pending.join(doneQ, Seq("__qid"), "left_anti").ckpt()
      nPending = pending.count()
      ring *= 2
    }
    require(nPending == 0, s"knn did not converge for $nPending queries")
    // materialize the (small) result, then free every round cache so a
    // long session doesn't accumulate executor-memory pressure
    val out = acc.ckpt()
    roundCaches.result().foreach(_.unpersist(false))
    out
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
