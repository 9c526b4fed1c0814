package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.gf
import graft.operators.SpatialJoin

/** The flagship spark-submit job (north rule): pages → geo_extract →
  * cell index → cell-bucketed PIP join → tile assignment → partitioned
  * parquet, resumable at batch granularity via per-partition lineage
  * records.
  *
  * Lineage model: the input is split into `nBatches` deterministic
  * hash-batches of pages (url-hash — stable across runs and cluster
  * sizes). Each batch runs as one fully-parallel Spark job writing
  * `out/batch=<b>/`, then commits a `_lineage/batch-<b>.json` record with
  * input/output counts and an order-insensitive result checksum. A
  * restarted job lists committed records and skips those batches — the
  * reference's chunked processing loops
  * (`/root/reference/gdal/alg/gdalrasterize.cpp:655-706`,
  * `gdal/alg/gdalwarpoperation.cpp:672-735`) are the restart units GDAL
  * never persisted; the lineage table is the genuinely-new part
  * (SURVEY.md §2.10).
  *
  * The per-row invariant (byte-identical `text` per `url`,
  * BASELINE.json.input_hint) holds by construction: `text` is carried
  * through untouched as a projection; [[graft.tools.PipelineCheck]]
  * verifies it by anti-joining output against input on (url, text).
  */
object Pipeline {

  final case class BatchResult(batch: Int, inPages: Long, outRows: Long, checksum: Long)

  final case class Config(
      outDir: String,
      nBatches: Int = 8,
      cellRes: Int = 7,
      tileDeg: Double = 0.1,
      tilePx: Int = 256,
      failAfterBatch: Int = -1) // test hook: throw after N committed batches

  /** Transform one page batch: extract coords, assign cells + tiles, join
    * zones. Pure projection of `text`/`url` — never rewritten.
    */
  def transform(pages: DataFrame, zones: DataFrame, cfg: Config): DataFrame = {
    val coords = pages
      .select(col("url"), col("warc_ts"), col("lang"), col("text"),
        posexplode(gf.geo_extract(col("text"))).as(Seq("mention_idx", "c")))
      .select(col("url"), col("warc_ts"), col("lang"), col("text"),
        col("mention_idx"), col("c.lon").as("lon"), col("c.lat").as("lat"))
    val joined = SpatialJoin.pointInPolygon(coords, col("lon"), col("lat"),
      zones, col("geom"), cfg.cellRes)
    joined
      .withColumn("cell", gf.cell_of(col("lon"), col("lat"), cfg.cellRes))
      .withColumn("tile_x", floor(((col("lon") + 180.0) / cfg.tileDeg) / cfg.tilePx).cast("long"))
      .withColumn("tile_y", floor(((lit(90.0) - col("lat")) / cfg.tileDeg) / cfg.tilePx).cast("long"))
      .drop("geom", "wkt")
  }

  private def lineageDir(cfg: Config) = s"${cfg.outDir}/_lineage"

  def committedBatches(spark: SparkSession, cfg: Config): Set[Int] = {
    val fs = new Path(cfg.outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(lineageDir(cfg))
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch-") && n.endsWith(".json") =>
        n.stripPrefix("batch-").stripSuffix(".json").toInt
      }.toSet
  }

  private def commitLineage(spark: SparkSession, cfg: Config, r: BatchResult): Unit = {
    val fs = new Path(cfg.outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(lineageDir(cfg)))
    val tmp = new Path(s"${lineageDir(cfg)}/.batch-${r.batch}.json.tmp")
    val fin = new Path(s"${lineageDir(cfg)}/batch-${r.batch}.json")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"batch":${r.batch},"in_pages":${r.inPages},"out_rows":${r.outRows},"checksum":${r.checksum}}"""
        .getBytes("UTF-8"))
    out.close()
    fs.rename(tmp, fin) // atomic commit: record exists ⇒ batch output complete
  }

  /** One batch: single scan of the batch input (the write job), with the
    * input-page count observed from that same scan (no second count job);
    * output stats come from re-reading the just-written batch parquet
    * (small, local to the batch) rather than caching the whole transform.
    */
  private def runBatch(spark: SparkSession, batchPages: DataFrame, zones: DataFrame,
                       cfg: Config, b: Int): BatchResult = {
    val obs = org.apache.spark.sql.Observation(s"graft_pipe_in_$b")
    val observed = batchPages.observe(obs, count(lit(1)).as("n"))
    transform(observed, zones, cfg)
      .write.mode("overwrite").parquet(s"${cfg.outDir}/batch=$b")
    val inCount = obs.get("n").asInstanceOf[Long]
    val stats = spark.read.parquet(s"${cfg.outDir}/batch=$b").agg(
      count(lit(1)),
      coalesce(bit_xor(xxhash64(col("url"), col("cell"), col("zone_id"))), lit(0L))).head()
    BatchResult(b, inCount, stats.getLong(0), stats.getLong(1))
  }

  private def commitLoop(spark: SparkSession, cfg: Config,
                         batchSource: Int => DataFrame, zones: DataFrame): Seq[BatchResult] = {
    val done = committedBatches(spark, cfg)
    val results = Seq.newBuilder[BatchResult]
    var committed = 0
    for (b <- 0 until cfg.nBatches if !done.contains(b)) {
      val r = runBatch(spark, batchSource(b), zones, cfg, b)
      commitLineage(spark, cfg, r)
      results += r
      committed += 1
      if (cfg.failAfterBatch >= 0 && committed > cfg.failAfterBatch)
        throw new RuntimeException(s"injected failure after batch $b (test hook)")
    }
    results.result()
  }

  /** Run (or resume) the pipeline over an arbitrary DataFrame input.
    * Batches are stable url-hash classes; each batch job scans the input
    * once (total nBatches scans — use [[runOnPath]] for file inputs, which
    * scans the whole input exactly once across all batches).
    */
  def run(spark: SparkSession, pages: DataFrame, zones: DataFrame,
          cfg: Config): Seq[BatchResult] =
    commitLoop(spark, cfg,
      b => pages.filter(pmod(xxhash64(col("url")), lit(cfg.nBatches)) === b), zones)

  /** Run (or resume) over a parquet directory: batch = contiguous range of
    * the sorted file list, so the full input is read exactly ONCE per run
    * (each batch job opens only its own files — no per-batch full scans).
    * File-list order is deterministic, so restarts and different cluster
    * sizes see identical batches.
    */
  def runOnPath(spark: SparkSession, inputPath: String, zones: DataFrame,
                cfg: Config): Seq[BatchResult] = {
    val fs = new Path(inputPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(inputPath))
      .map(_.getPath.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("/_"))
      .sorted
    require(files.nonEmpty, s"no parquet files under $inputPath")
    val perBatch: Array[Array[String]] =
      Array.tabulate(cfg.nBatches)(b => files.zipWithIndex.collect {
        case (f, i) if i % cfg.nBatches == b => f
      })
    commitLoop(spark, cfg,
      b => if (perBatch(b).isEmpty)
        spark.read.parquet(files.head).limit(0)
      else spark.read.parquet(perBatch(b): _*), zones)
  }

  /** Read back the full (resumed) output. */
  def output(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet((0 until cfg.nBatches).map(b => s"${cfg.outDir}/batch=$b"): _*)
}
