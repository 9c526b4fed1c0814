package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * partition-batched kernels (`mapPartitions` over typed rows — the JVM
  * analogue of `mapInPandas` batch processing).
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] is a clearly-marked deterministic stand-in
  * that parses only our own synthetic header. Everything around it — the
  * schema, the batching, the partition layout, null/corrupt handling — is
  * the real production plumbing and is tested.
  */
object Multimodal {

  /** A media row: payload + minimal typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, url: String,
                            bytes: Array[Byte], width: Int, height: Int)

  /** Extracted features per media item. */
  final case class MediaFeatures(media_id: Long, kind: String, ok: Boolean,
                                 width: Int, height: Int,
                                 feature: Array[Float])

  /** Deterministic synthetic media: an 8-byte magic header + dims + a
    * seeded payload. Stands in for real JPEG/PNG/WAV bytes.
    */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val h = graft.sources.Pages.mix(seed ^ id)
      val kinds = Array("image", "audio", "video")
      val kind = kinds(((h >>> 2) % 3).toInt)
      val w = 16 + ((h >>> 8) % 64).toInt
      val ht = 16 + ((h >>> 16) % 64).toInt
      val payload = new Array[Byte](32)
      var i = 0
      while (i < 32) { payload(i) = graft.sources.Pages.mix(h + i).toByte; i += 1 }
      val buf = java.nio.ByteBuffer.allocate(16 + 32)
      buf.putLong(0x47524654414d4544L) // "GRFTAMED" magic
      buf.putInt(w).putInt(ht)
      buf.put(payload)
      MediaRow(id, kind, s"s3://bucket/media/$id", buf.array(), w, ht)
    }
  }

  /** STUB decoder — deterministic fake. A real deployment swaps this for
    * an actual codec (libjpeg/ffmpeg etc.); the signature and batch shape
    * are what production code would use.
    */
  object FakeDecoder {
    final val Magic = 0x47524654414d4544L

    /** Returns a dim-`d` feature vector or null for corrupt payloads. */
    def decode(bytes: Array[Byte], d: Int): Array[Float] = {
      if (bytes == null || bytes.length < 16) return null
      val buf = java.nio.ByteBuffer.wrap(bytes)
      if (buf.getLong() != Magic) return null
      buf.getInt(); buf.getInt()
      val out = new Array[Float](d)
      var acc = 0xcbf29ce484222325L
      var i = 16
      while (i < bytes.length) {
        acc = (acc ^ bytes(i)) * 0x100000001b3L
        out((i - 16) % d) = ((acc >>> 32).toInt.toFloat) / Int.MaxValue
        i += 1
      }
      out
    }
  }

  /** Partition-batched feature extraction. Corrupt payloads produce
    * ok=false rows rather than failing the task (poison-pill isolation).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = FakeDecoder.decode(m.bytes, dim)
        if (f == null) MediaFeatures(m.media_id, m.kind, ok = false, m.width, m.height, Array.empty)
        else MediaFeatures(m.media_id, m.kind, ok = true, m.width, m.height, f)
      }
    }
  }

  /** Metadata-only "resize" plan: target dims computed declaratively; the
    * actual pixel resample happens in the decode kernel at materialization
    * (STUB here). Shows the real schema/partitioning shape.
    */
  def planResize(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    media.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for video rows: deterministic frame indices. */
  def planFrameSample(media: DataFrame, everyN: Int, maxFrames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit((maxFrames - 1) * everyN), lit(everyN))))
}
