package graft.raster

/** Exact port of GDALChecksumImage (`/root/reference/gdal/alg/
  * gdalchecksum.cpp:58-166`): rolling sum of `value % primes[i mod 11]`
  * over pixels in row-major order, masked to 16 bits.
  *
  * Distribution note (SURVEY.md §7.4): `nChecksum &= 0xffff` after every
  * addition is equivalent to masking once at the end, because two's-
  * complement addition is associative mod 2^16. The prime index is a pure
  * function of the global pixel index (`(y*width + x) mod 11`), so each
  * tile/strip computes an independent partial sum given its starting pixel
  * index; the combine is a plain sum + final mask — an order-insensitive,
  * shuffle-free aggregation.
  */
object Checksum {

  private val Primes = Array(7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43)

  /** Partial checksum of `n` int pixels starting at global pixel index
    * `startIndex` (row-major). C `%` = truncated remainder — same as Scala.
    */
  def partialInt(vals: Array[Int], off: Int, n: Int, startIndex: Long): Long = {
    var iPrime = (startIndex % 11).toInt
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += vals(off + i) % Primes(iPrime)
      iPrime += 1
      if (iPrime > 10) iPrime = 0
      i += 1
    }
    sum
  }

  /** Byte pixels (unsigned 0..255 as GDAL reads GDT_Byte into Int32). */
  def partialByte(vals: Array[Byte], off: Int, n: Int, startIndex: Long): Long = {
    var iPrime = (startIndex % 11).toInt
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += (vals(off + i) & 0xff) % Primes(iPrime)
      iPrime += 1
      if (iPrime > 10) iPrime = 0
      i += 1
    }
    sum
  }

  /** Float path: convert each double per GDALCopyWords float→Int32 rules
    * (`gdalchecksum.cpp:103-117`): NaN/Inf → 0x80000000, else floor(v+0.5)
    * clamped to ±2147483647.
    */
  def partialDouble(vals: Array[Double], off: Int, n: Int, startIndex: Long): Long = {
    var iPrime = (startIndex % 11).toInt
    var sum = 0L
    var i = 0
    while (i < n) {
      val d = vals(off + i)
      val v: Int =
        if (d.isNaN || d.isInfinite) 0x80000000
        else {
          val s = d + 0.5
          if (s < -2147483647.0) -2147483647
          else if (s > 2147483647.0) 2147483647
          else math.floor(s).toInt
        }
      sum += v % Primes(iPrime)
      iPrime += 1
      if (iPrime > 10) iPrime = 0
      i += 1
    }
    sum
  }

  def finish(partialSum: Long): Int = (partialSum & 0xffff).toInt

  /** Whole-band checksum of a byte raster stored band-sequentially. */
  def ofByteBand(data: Array[Byte], width: Int, height: Int, band: Int): Int =
    finish(partialByte(data, band * width * height, width * height, 0L))

  def ofDoubleBand(data: Array[Double], width: Int, height: Int, band: Int): Int =
    finish(partialDouble(data, band * width * height, width * height, 0L))
}
