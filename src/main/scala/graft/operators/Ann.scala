package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - [[cosineTopK]] is the exact brute-force baseline: queries broadcast,
  *   dot products computed with built-in higher-order functions
  *   (zip_with + aggregate — stays inside codegen), global top-k per query
  *   via window. One scan of the corpus, no shuffle of the corpus side.
  * - [[lshTopK]] is the scale path: deterministic random-hyperplane
  *   signatures bucket the corpus; each query probes its own bucket (and
  *   multi-probe neighbors at hamming distance 1), computing exact cosine
  *   only within probed buckets. Recall is tunable via `bits`/multiprobe.
  */
object Ann {

  private def l2(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  /** Cosine similarity of two float-array columns.
    *
    * ZERO-NORM SENTINEL: when either vector has zero norm the result is
    * the mathematically-undefined 0/0; this helper returns −1.0 for such
    * rows instead of NaN, because Spark orders NaN ABOVE every double and
    * a single all-zero embedding (failed/padded row) would otherwise rank
    * FIRST in every top-k. Callers who need to distinguish zero-norm rows
    * from genuinely opposite vectors should pre-filter
    * (`aggregate(v,…) != 0`) or use [[cosineOrNull]].
    */
  def cosine(a: Column, b: Column): Column = {
    val d = l2(a) * l2(b)
    when(d === 0.0, lit(-1.0)).otherwise(dot(a, b) / d)
  }

  /** Cosine similarity with NULL (not a −1.0 sentinel) for zero-norm
    * inputs — the variant for direct analytical use where "undefined" must
    * stay distinguishable from "opposite".
    */
  def cosineOrNull(a: Column, b: Column): Column = {
    val d = l2(a) * l2(b)
    when(d === 0.0, lit(null).cast("double")).otherwise(dot(a, b) / d)
  }

  /** Exact top-k by cosine for each query vector.
    *
    * @param corpus DataFrame with (id, vec: array<float>)
    * @param queries DataFrame with (qid, qvec: array<float>) — small side
    */
  /** Per-partition top-k reduction: each input partition keeps only its k
    * best (cosine desc, id asc) rows per query in a bounded heap, so the
    * global window ranks at most partitions×k×queries rows instead of
    * funneling the whole corpus×query product through one reducer per
    * query. Exact: the global top-k is a subset of every partition's local
    * top-k.
    */
  private def localThenGlobalTopK(scored: DataFrame, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    // worst-first ordering: max of the heap = the row to evict
    val worstFirst: Ordering[(Long, Long, Double)] =
      Ordering.by(t => (-t._3, t._2)) // lower cosine = greater; tie: higher id
    val partial = scored.select(col("qid"), col("id"), col("cosine"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
        it.foreach { row =>
          val h = heaps.getOrElseUpdate(row._1,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < k) h.enqueue(row)
          else if (worstFirst.lt(row, h.head)) { h.dequeue(); h.enqueue(row) }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }.toDF("qid", "id", "cosine")
    partial
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("id"), col("cosine"))
  }

  def cosineTopK(corpus: DataFrame, id: Column, vec: Column,
                 queries: DataFrame, qid: Column, qvec: Column, k: Int): DataFrame = {
    val q = broadcast(queries.select(qid.cast("long").as("qid"), qvec.as("__qv")))
    val scored = corpus.select(id.cast("long").as("id"), vec.as("__v"))
      .crossJoin(q)
      .withColumn("cosine", cosine(col("__v"), col("__qv")))
    localThenGlobalTopK(scored, k)
  }

  /** Deterministic hyperplane signature: bit b = sign(dot(v, plane_b)),
    * planes derived from splitmix64(seed, b, dim-index) mapped to ±1
    * components (sign-random projections — cheap and model-free).
    */
  def hyperplaneSig(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    // plane component for (bit b, index i): ±1 from a hash — computed via
    // a literal matrix baked into the plan (deterministic, no RNG at run time)
    val planes: Array[Array[Double]] = Array.tabulate(bits, dim) { (b, i) =>
      val h = graft.sources.Pages.mix(seed ^ (b.toLong << 32) ^ i.toLong)
      if ((h & 1L) == 0L) 1.0 else -1.0
    }
    val sigBits = (0 until bits).map { b =>
      val plane = array(planes(b).map(lit): _*)
      val d = aggregate(zip_with(vec, plane, (x, p) => x.cast("double") * p),
        lit(0.0d), (acc, x) => acc + x)
      when(d >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k with hamming-≤`probeRadius` multiprobe
    * (radius 1 = classic flip-one-bit probing; radius 2 trades ~bits²/2
    * extra bucket probes for substantially higher recall).
    */
  def lshTopK(corpus: DataFrame, id: Column, vec: Column,
              queries: DataFrame, qid: Column, qvec: Column,
              k: Int, dim: Int, bits: Int = 12, seed: Long = 42L,
              probeRadius: Int = 1): DataFrame = {
    val c = corpus.select(id.cast("long").as("id"), vec.as("__v"))
      .withColumn("__bucket", hyperplaneSig(col("__v"), dim, bits, seed))
    val masks = Seq.newBuilder[Long]
    masks += 0L
    if (probeRadius >= 1) for (i <- 0 until bits) masks += (1L << i)
    if (probeRadius >= 2)
      for (i <- 0 until bits; j <- i + 1 until bits) masks += ((1L << i) | (1L << j))
    val probes = masks.result().map(lit)
    val q = broadcast(
      queries.select(qid.cast("long").as("qid"), qvec.as("__qv"))
        .withColumn("__qsig", hyperplaneSig(col("__qv"), dim, bits, seed))
        .withColumn("__flip", explode(array(probes: _*)))
        .withColumn("__qbucket", expr("__qsig ^ __flip"))
        .drop("__qsig", "__flip"))
    val scored = c.join(q, col("__bucket") === col("__qbucket"))
      .withColumn("cosine", cosine(col("__v"), col("__qv")))
    localThenGlobalTopK(scored, k)
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN: coarse k-means quantizer, nprobe buckets
  // ------------------------------------------------------------------

  private def l2norm(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(_ / n)
  }

  /** Deterministic Lloyd's k-means over a sample (driver-side — the
    * codebook is tiny; the reference pattern for IVF training everywhere).
    * Vectors are L2-normalized so euclidean argmin == cosine argmax.
    */
  private[operators] def trainCentroids(sample: Array[Array[Double]], nlist: Int,
                                        iters: Int = 10): Array[Array[Double]] = {
    val n = sample.length
    require(n >= nlist, s"sample $n smaller than nlist $nlist")
    val normed = sample.map(l2norm)
    // deterministic spread init: every (n/nlist)-th sample
    var centroids = Array.tabulate(nlist)(i => normed((i * n) / nlist).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](normed(0).length))
      val counts = new Array[Int](nlist)
      normed.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < nlist) {
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) centroids(c)
        else l2norm(sums(c).map(_ / counts(c)))
      }
    }
    centroids
  }

  private def nearestCentroids(v: Array[Double], centroids: Array[Array[Double]],
                               howMany: Int): Array[Int] = {
    val nv = l2norm(v)
    centroids.indices.map { c =>
      var d = 0.0; var i = 0
      while (i < nv.length) { val t = nv(i) - centroids(c)(i); d += t * t; i += 1 }
      (d, c)
    }.sortBy(x => (x._1, x._2)).take(howMany).map(_._2).toArray
  }

  /** IVF approximate top-k: corpus vectors live in the bucket of their
    * nearest coarse centroid (ONE bucket per vector — the inverted file);
    * each query probes its `nprobe` nearest centroids and computes exact
    * cosine only inside those buckets. Recall/cost knobs: nlist (bucket
    * count ≈ √corpus is classic) and nprobe.
    *
    * Scale shape: training samples ~nlist·40 vectors (driver, tiny
    * codebook broadcast); assignment is one map over the corpus; the
    * query-bucket join shuffles only probed buckets; top-k reduces via
    * per-partition heaps. No all-pairs stage anywhere.
    *
    * @param sampleMod keep every row whose xxhash64(id) % sampleMod == 0
    *                  for codebook training. Default 0 = auto: bottom-k by
    *                  xxhash64(id) (TakeOrdered — per-partition heaps, ONE
    *                  scan of the corpus, no count() pre-pass) takes exactly
    *                  nlist·40 rows to the driver — never a full-corpus
    *                  collect at scale.
    */
  def ivfTopK(corpus: DataFrame, id: Column, vec: Column,
              queries: DataFrame, qid: Column, qvec: Column,
              k: Int, nlist: Int = 64, nprobe: Int = 8,
              sampleMod: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c0 = corpus.select(id.cast("long").as("id"), vec.as("__v"))
    // deterministic sample for training: explicit hash-mod filter when the
    // caller pins sampleMod, otherwise a single-scan bottom-k hash sample
    val sample: Array[Array[Double]] =
      (if (sampleMod >= 1)
        c0.filter(pmod(xxhash64(col("id")), lit(sampleMod.toLong)) === 0)
          .select(col("__v")).as[Array[Float]].collect()
      else
        // bottom-k by hash = one TakeOrdered scan; re-sorted by id on the
        // driver so Lloyd's spread init sees a stable, meaningful order
        c0.select(col("id"), col("__v"))
          .orderBy(xxhash64(col("id")), col("id"))
          .limit(nlist * 40)
          .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
      ).map(_.map(_.toDouble))
    val centroids = trainCentroids(sample, math.min(nlist, math.max(1, sample.length)))
    val cb = spark.sparkContext.broadcast(centroids)

    val bucketed = c0.as[(Long, Array[Float])].map { case (i, v) =>
      (i, v, nearestCentroids(v.map(_.toDouble), cb.value, 1)(0))
    }.toDF("id", "__v", "__bucket")

    val probes = broadcast(
      queries.select(qid.cast("long").as("qid"), qvec.as("__qv"))
        .as[(Long, Array[Float])].flatMap { case (q, v) =>
          nearestCentroids(v.map(_.toDouble), cb.value, nprobe).map(b => (q, v, b))
        }.toDF("qid", "__qv", "__qbucket"))

    val scored = bucketed.join(probes, col("__bucket") === col("__qbucket"))
      .withColumn("cosine", cosine(col("__v"), col("__qv")))
    localThenGlobalTopK(scored, k)
  }
}
