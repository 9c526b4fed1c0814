package graft.operators

import graft.core.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gf

/** Deduplication operators for web-scale text corpora. All plans are
  * declarative (groupBy/join on hash keys) so Catalyst handles pushdown
  * and AQE handles skew; no driver-side loops over data.
  *
  * Scale notes:
  *  - exact dedup is a single hash-shuffle on a 64-bit content hash (not
  *    the full text) — map-side partial aggregation keeps it one pass;
  *  - MinHash-LSH emits `bands` rows per doc, self-joins per band bucket
  *    (candidate generation), verifies with the exact signature, and
  *    optionally with true n-gram Jaccard — the standard
  *    shingle→minhash→band→bucket-join pipeline;
  *  - SimHash candidates use 4×16-bit block keys: two docs within hamming
  *    distance ≤ 3 share at least one of 4 blocks (pigeonhole).
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `keep` per identical
    * `text`. The window partitions by (hash, length, text): the hash
    * prefix keeps shuffle distribution and comparison fast, the text
    * itself guarantees exactness — a 64-bit collision between distinct
    * equal-length documents (realistic odds at 10^9+ docs) must not
    * silently delete one of them. The full row is in the shuffle either
    * way, so the extra key costs nothing.
    */
  def exact(df: DataFrame, text: Column, keep: Column): DataFrame = {
    val w = Window.partitionBy(xxhash64(text), length(text), text).orderBy(keep)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Count of exact-duplicate groups and surviving rows (cheap audit). */
  def exactStats(df: DataFrame, text: Column): DataFrame =
    df.groupBy(xxhash64(text).as("h"), length(text).as("len"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("distinct_docs"), sum(col("n")).as("total_docs"))

  /** MinHash-LSH candidate pairs with signature-estimated Jaccard.
    *
    * @param df input with an id column and a text column
    * @param numHashes signature length
    * @param bands LSH bands (rows per band = numHashes / bands)
    * @param threshold keep pairs whose signature agreement ≥ threshold
    * @return (id_a, id_b, est_jaccard) with id_a < id_b
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
                   numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7, shingle: Int = 5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val withSig = df.select(id.cast("long").as("id"),
      gf.minhash_sig(text, shingle, numHashes).as("sig"))
    // one row per (doc, band): bucket key = hash of the band's slice
    // localCheckpoint: the banded DF feeds BOTH sides of the self-join —
    // without it the shingle+numHashes signature pass (the dominant cost)
    // runs twice. Eager checkpoint materializes it once; both join sides
    // read the checkpointed blocks.
    val banded = withSig.select(col("id"), col("sig"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> named_struct('band', b, 'key', xxhash64(b, slice(sig, b * $rows + 1, $rows))))")).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
      .ckpt()
    val a = banded.select(col("band").as("band_a"), col("key").as("key_a"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band").as("band_b"), col("key").as("key_b"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b,
        col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("est_jaccard",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash near-duplicate pairs within `maxHamming` (≤ 3 guaranteed by
    * the 4-block pigeonhole; larger radii lose recall).
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(id.cast("long").as("id"), gf.simhash64(text).as("sim"))
    val blocks = withSim.select(col("id"), col("sim"),
      explode(expr("transform(sequence(0, 3), b -> named_struct('blk', b, " +
        "'key', (sim >> (b * 16)) & 65535))")).as("bk"))
      .select(col("id"), col("sim"), col("bk.blk"), col("bk.key"))
    val a = blocks.select(col("blk").as("blk_a"), col("key").as("key_a"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = blocks.select(col("blk").as("blk_b"), col("key").as("key_b"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, col("blk_a") === col("blk_b") && col("key_a") === col("key_b") &&
        col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", gf.hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs — the vector leg of the dedup
    * family. [[embedNearDupExact]] is the all-pairs correctness baseline
    * (one broadcast side; fine to ~1e5 vectors). [[embedNearDupLsh]] is
    * the scale path: hyperplane-LSH bucketed self-join (hamming-probe
    * neighbor buckets) + exact cosine verification inside buckets only —
    * no all-pairs stage, same shape as the banded MinHash join.
    */
  def embedNearDupExact(corpus: DataFrame, id: Column, vec: Column,
                        threshold: Double): DataFrame = {
    val a = corpus.select(id.cast("long").as("id_a"), vec.as("__va"))
    val b = corpus.select(id.cast("long").as("id_b"), vec.as("__vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(Ann.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  def embedNearDupLsh(corpus: DataFrame, id: Column, vec: Column,
                      threshold: Double, dim: Int, bits: Int = 8,
                      seed: Long = 42L, probeRadius: Int = 1): DataFrame = {
    val sigd = corpus.select(id.cast("long").as("id"), vec.as("__v"))
      .withColumn("__sig", Ann.hyperplaneSig(col("__v"), dim, bits, seed))
    val masks = Seq.newBuilder[Long]
    masks += 0L
    if (probeRadius >= 1) for (i <- 0 until bits) masks += (1L << i)
    if (probeRadius >= 2)
      for (i <- 0 until bits; j <- i + 1 until bits) masks += ((1L << i) | (1L << j))
    val probes = masks.result().map(lit)
    val a = sigd.select(col("id").as("id_a"), col("__v").as("__va"),
      col("__sig").as("__siga"))
      .withColumn("__flip", explode(array(probes: _*)))
      .withColumn("__bucket", expr("__siga ^ __flip"))
    val b = sigd.select(col("id").as("id_b"), col("__v").as("__vb"),
      col("__sig").as("__sigb"))
    a.join(b, col("__bucket") === col("__sigb") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(Ann.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Near-duplicate CLUSTERING: minhash candidate pairs → distributed
    * connected components ([[UnionFind]], min-label) → one row per doc
    * with `cluster` = the smallest doc id in its near-dup component
    * (singletons cluster with themselves). The scalable "keep one document
    * per near-dup cluster" pipeline step is then
    * `clusters(...).filter($"id" === $"cluster")` — no all-pairs stage,
    * no driver-side graph at any corpus size.
    */
  def clusters(df: DataFrame, id: Column, text: Column,
               numHashes: Int = 64, bands: Int = 16,
               threshold: Double = 0.7, shingle: Int = 5): DataFrame = {
    val pairs = minhashPairs(df, id, text, numHashes, bands, threshold, shingle)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val roots = graft.operators.UnionFind.roots(pairs)
      .withColumnRenamed("gid", "id")
    // materialize the assignment, then release the union-find cache (its
    // contract asks callers to unpersist the returned frame)
    val out = df.select(id.cast("long").as("id"))
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
      .ckpt()
    roots.unpersist(false)
    out
  }

  /** Exact n-gram Jaccard verification over candidate pairs. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, id: Column, text: Column,
                    n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val d = docs.select(id.cast("long").as("__vid"), text.as("__vtext"))
    pairs
      .join(d, col("id_a") === col("__vid")).withColumnRenamed("__vtext", "__ta").drop("__vid")
      .join(d, col("id_b") === col("__vid")).withColumnRenamed("__vtext", "__tb").drop("__vid")
      .withColumn("jaccard", gf.ngram_jaccard(col("__ta"), col("__tb"), n))
      .filter(col("jaccard") >= threshold)
      .drop("__ta", "__tb")
  }
}
