package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * partition-batched kernels (`mapPartitions` over typed rows — the JVM
  * analogue of `mapInPandas` batch processing).
  *
  * Image decode is REAL for PNG/JPEG via the JDK's built-in
  * `javax.imageio` ([[ImageDecoder]] — no external dependency); payloads
  * are dispatched on their container magic bytes. Audio/video codecs are
  * not in the JDK, so those payloads (and our synthetic fixture header)
  * still route through [[FakeDecoder]], a clearly-marked deterministic
  * stand-in. Everything around the codecs — the schema, the batching, the
  * partition layout, null/corrupt poison-pill handling — is the real
  * production plumbing and is tested.
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

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
    * the formats the built-in SPI registry ships readers for). Executors
    * call this inside `mapPartitions`; ImageIO readers are fetched per
    * call from the thread-safe registry, and decode failures return null
    * so the caller can poison-pill instead of failing the task.
    */
  object ImageDecoder {

    /** True if the payload starts with a container magic ImageIO can read:
      * PNG (\x89PNG), JPEG (FF D8), GIF87a/89a, BMP ("BM").
      */
    def looksLikeImage(bytes: Array[Byte]): Boolean = {
      if (bytes == null || bytes.length < 4) return false
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      (b0 == 0x89 && b1 == 'P') || (b0 == 0xff && b1 == 0xd8) ||
        (b0 == 'G' && b1 == 'I') || (b0 == 'B' && b1 == 'M')
    }

    /** Decoded raster: dims + packed ARGB pixels (row-major). */
    final case class Decoded(width: Int, height: Int, argb: Array[Int])

    def decode(bytes: Array[Byte]): Decoded = {
      if (bytes == null || bytes.length == 0) return null
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) return null
        val w = img.getWidth; val h = img.getHeight
        Decoded(w, h, img.getRGB(0, 0, w, h, null, 0, w))
      } catch { case _: java.io.IOException | _: RuntimeException => null }
    }

    /** Deterministic dim-`d` feature from decoded pixels: a d-band
      * mean-luminance profile (rows partitioned into d horizontal bands,
      * Rec.601 luma, normalized to [0,1]) — the classic cheap visual
      * fingerprint shape a real pipeline would feed downstream dedup.
      */
    def feature(dec: Decoded, d: Int): Array[Float] = {
      val sums = new Array[Double](d)
      val counts = new Array[Long](d)
      var y = 0
      while (y < dec.height) {
        val band = math.min(d - 1, y * d / dec.height)
        var x = 0
        while (x < dec.width) {
          val p = dec.argb(y * dec.width + x)
          val lum = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
            0.114 * (p & 0xff)
          sums(band) += lum; counts(band) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(d)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
    }

    /** Real resample: bilinear scale so max(w,h) <= maxSide (no upscale),
      * re-encoded as PNG. Returns (pngBytes, width, height); null on
      * decode failure. Dims ride along so the caller never has to
      * re-decode the fresh PNG just to read them back.
      */
    def resize(bytes: Array[Byte], maxSide: Int): (Array[Byte], Int, Int) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) return null
      val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
      val tw = math.max(1, math.ceil(img.getWidth * scale).toInt)
      val th = math.max(1, math.ceil(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(tw, th,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (bos.toByteArray, tw, th)
    }
  }

  /** STUB decoder — deterministic fake for payloads the JDK has no codec
    * for (audio/video, and the synthetic fixture header). A real deployment
    * swaps this for an actual codec (ffmpeg etc.); the signature and batch
    * shape are what production code would use.
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

  /** Partition-batched feature extraction. Real-image payloads (PNG/JPEG/
    * GIF/BMP magic) decode through `javax.imageio` and report the DECODED
    * dims; everything else falls back to the synthetic-header decoder.
    * Corrupt payloads produce ok=false rows rather than failing the task
    * (poison-pill isolation).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (ImageDecoder.looksLikeImage(m.bytes)) {
          val dec = ImageDecoder.decode(m.bytes)
          if (dec == null)
            MediaFeatures(m.media_id, m.kind, ok = false, m.width, m.height, Array.empty)
          else
            MediaFeatures(m.media_id, m.kind, ok = true, dec.width, dec.height,
              ImageDecoder.feature(dec, dim))
        } else {
          val f = FakeDecoder.decode(m.bytes, dim)
          if (f == null) MediaFeatures(m.media_id, m.kind, ok = false, m.width, m.height, Array.empty)
          else MediaFeatures(m.media_id, m.kind, ok = true, m.width, m.height, f)
        }
      }
    }
  }

  /** Materialized resize over image payloads: decode → bilinear downscale
    * to `maxSide` → PNG re-encode, all inside the partition (pixels never
    * leave the executor). Non-image rows (audio/video/unknown magic) pass
    * through UNCHANGED — the operator must never destroy payloads it was
    * not built to transform. Image rows whose decode fails come back with
    * null bytes and width/height = -1 (the corrupt-row marker).
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (!ImageDecoder.looksLikeImage(m.bytes)) m
        else {
          val out = ImageDecoder.resize(m.bytes, maxSide)
          if (out == null) m.copy(bytes = null, width = -1, height = -1)
          else m.copy(bytes = out._1, width = out._2, height = out._3)
        }
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
