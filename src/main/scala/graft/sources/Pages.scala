package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style page table — the graft input
  * shape (authoritative: BASELINE.json.input_hint):
  *
  *   pages(url: string, warc_ts: timestamp, html: binary, text: string,
  *         lang: string)
  *
  * Generation is a pure function of (seed, id): the same `n` produces the
  * same bytes at any parallelism (the two-cluster-size scaling run must see
  * identical input). A deterministic subset of pages embeds 0..3 coordinate
  * mentions in `text` using the geo_extract grammar; `text` is NEVER
  * rewritten downstream (per-row invariant: byte-identical text per url).
  *
  * Role of the reference: the geocoder cache table
  * (`/root/reference/gdal/ogr/ogr_geocoding.cpp:115-117,:1379`) is the
  * analogue of "coordinates mentioned in page text"; here mentions are
  * synthesized rather than fetched.
  */
object Pages {
  // Locale.ROOT formatting: the f-interpolator uses the JVM default
  // locale, so a de/fr executor would emit comma decimals that neither
  // geo_extract nor the WKT parser accept — breaking the "same n, same
  // bytes, any JVM" determinism contract
  private def d4(v: Double): String =
    java.lang.String.format(java.util.Locale.ROOT, "%.4f", java.lang.Double.valueOf(v))
  private def d6(v: Double): String =
    java.lang.String.format(java.util.Locale.ROOT, "%.6f", java.lang.Double.valueOf(v))

  /** Append centi-degrees as a fixed "I.FF" + trailing zeros — exact,
    * allocation-free, locale-independent.
    */
  private def appendCenti(sb: StringBuilder, centi: Int, zeros: String): Unit = {
    var c = centi
    if (c < 0) { sb.append('-'); c = -c }
    sb.append(c / 100).append('.')
    val f = c % 100
    sb.append(('0' + f / 10).toChar).append(('0' + f % 10).toChar).append(zeros)
  }


  /** splitmix64 — stable across JVMs, cheap, well-mixed. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val langs = Array("en", "de", "fr", "es", "ja", "pt", "ru", "zh")
  private val words = Array(
    "the", "data", "map", "city", "river", "travel", "news", "report",
    "region", "local", "market", "story", "photo", "guide", "world", "place")

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                        text: String, lang: String)

  /** Build one page purely from (seed, id). */
  def page(seed: Long, id: Long): Page = {
    val h0 = mix(seed ^ id)
    val h1 = mix(h0)
    val h2 = mix(h1)
    val url = s"https://site-${(h0 & 0xffff)}.example.org/p/$id"
    val ts = new Timestamp(1577836800000L + (h0 >>> 24) % (86400L * 365 * 1000)) // 2020 + <1y
    val lang = langs(((h1 >>> 8) & 0x7).toInt)
    // body text: 8..40 words
    val sb = new StringBuilder(256)
    val nWords = 8 + ((h1 >>> 16) % 33).toInt
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(words((mix(h1 + i) & 0xf).toInt))
      i += 1
    }
    // 0..3 coordinate mentions (≈60% of pages have ≥1)
    val nCoords = (h2 & 0x7) match {
      case 0 | 1 | 2 => 0L
      case 3 | 4 => 1L
      case 5 | 6 => 2L
      case _ => 3L
    }
    var c = 0
    while (c < nCoords) {
      val hc = mix(h2 + 17 * c)
      // integer centi-degrees: the generated grid is exact hundredths, so
      // formatting from the integer is byte-identical to %.4f/%.6f of the
      // double while skipping java.util.Formatter entirely (Formatter was
      // ~2/3 of the whole page-synthesis cost) — and locale-proof
      val latC = ((hc & 0x3ffff) % 18000).toInt - 9000 // [-90.00, 90.00)
      val lonC = (((hc >>> 20) & 0x7ffff) % 36000).toInt - 18000
      // grammar form rotates among the three geo_extract patterns
      (hc >>> 60) % 3 match {
        case 0 =>
          val ns = if (latC < 0) "S" else "N"
          val ew = if (lonC < 0) "W" else "E"
          sb.append(' '); appendCenti(sb, math.abs(latC), "00"); sb.append(ns)
          sb.append(' '); appendCenti(sb, math.abs(lonC), "00"); sb.append(ew)
        case 1 =>
          sb.append(" lat="); appendCenti(sb, latC, "00")
          sb.append(" lon="); appendCenti(sb, lonC, "00")
        case _ =>
          sb.append(" geo:"); appendCenti(sb, latC, "0000")
          sb.append(','); appendCenti(sb, lonC, "0000")
      }
      c += 1
    }
    val text = sb.toString
    val html = s"<html><body><p>$text</p></body></html>".getBytes("UTF-8")
    Page(url, ts, html, text, lang)
  }

  /** Distributed deterministic page table. */
  def synth(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val rng = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    rng.map(id => page(seed, id)).toDF()
  }

  /** Deterministic zone polygons in lon/lat: `n` rectangles-with-one-notch
    * (concave octagon-ish) spread over land-ish latitudes. Returned as
    * (zone_id: Long, wkt: String).
    */
  def zones(n: Int, seed: Long = 42L): Seq[(Long, String)] = {
    (0 until n).map { i =>
      val h = mix(seed ^ (0xF0EEDL + i)).abs
      val cx = (h % 34000).toDouble / 100.0 - 170.0
      val cy = ((h >>> 20) % 14000).toDouble / 100.0 - 70.0
      val w = 2.0 + ((h >>> 40) % 800).toDouble / 100.0 // 2..10 deg
      val ht = 2.0 + ((h >>> 50) % 600).toDouble / 100.0
      val x0 = cx - w / 2; val x1 = cx + w / 2
      val y0 = cy - ht / 2; val y1 = cy + ht / 2
      val nx = x0 + w * 0.4; val nx2 = x0 + w * 0.6; val ny = y1 - ht * 0.35
      // concave notch on the top edge exercises real PIP (not just bbox)
      def pt(x: Double, y: Double): String = d4(x) + " " + d4(y)
      val wkt = "POLYGON ((" + Seq(pt(x0, y0), pt(x1, y0), pt(x1, y1),
        pt(nx2, y1), pt(nx2, ny), pt(nx, ny), pt(nx, y1),
        pt(x0, y1), pt(x0, y0)).mkString(",") + "))"
      (i.toLong, wkt)
    }
  }
}
