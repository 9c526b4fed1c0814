package graft.core

/** General coordinate-reference-system transforms — the engine's slice of
  * `OGRCoordinateTransformation` (`/root/reference/gdal/ogr/ogrct.cpp:905`,
  * which delegates to PROJ). Re-expressed from the public formulations in
  * Snyder, *Map Projections — A Working Manual* (USGS PP 1395):
  * Transverse Mercator (8-9..8-17), Lambert Conformal Conic 2SP
  * (15-1..15-11), Polar Stereographic (21-33..21-41), and Lambert
  * Azimuthal Equal-Area (24-3..24-29), plus the Bursa–Wolf 7-parameter
  * Helmert datum shift through geocentric coordinates.
  *
  * All projection math is lon/lat in RADIANS <-> easting/northing in
  * meters. [[Proj.transform]] composes inverse(src) → datum shift via
  * WGS84 → forward(dst) and dispatches by EPSG code.
  */
object Proj {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = if (invF == 0) 0.0 else 1.0 / invF
    val b: Double = a * (1 - f)
    val es: Double = f * (2 - f) // first eccentricity squared
    val e: Double = math.sqrt(es)
  }

  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val GRS80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)
  val Intl1924: Ellipsoid = Ellipsoid(6378388.0, 297.0)
  val Clarke1866: Ellipsoid = Ellipsoid(6378206.4, 294.978698214)

  /** Position-vector 7-parameter Helmert transform TO WGS84
    * (tx,ty,tz meters; rx,ry,rz arc-seconds; ds ppm).
    */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rx: Double, ry: Double, rz: Double, ds: Double) {
    private val s = 1.0 + ds * 1e-6
    private val rxr = math.toRadians(rx / 3600.0)
    private val ryr = math.toRadians(ry / 3600.0)
    private val rzr = math.toRadians(rz / 3600.0)

    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      tx + s * (x - rzr * y + ryr * z),
      ty + s * (rzr * x + y - rxr * z),
      tz + s * (-ryr * x + rxr * y + z))

    /** Exact inverse of the (small-angle) forward map. */
    def inverse(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val px = (x - tx) / s; val py = (y - ty) / s; val pz = (z - tz) / s
      // invert I + R (R skew-symmetric small-angle) exactly via Cramer
      val r = Array(
        1.0, -rzr, ryr,
        rzr, 1.0, -rxr,
        -ryr, rxr, 1.0)
      val det =
        r(0) * (r(4) * r(8) - r(5) * r(7)) -
        r(1) * (r(3) * r(8) - r(5) * r(6)) +
        r(2) * (r(3) * r(7) - r(4) * r(6))
      val ix = ((r(4) * r(8) - r(5) * r(7)) * px +
                (r(2) * r(7) - r(1) * r(8)) * py +
                (r(1) * r(5) - r(2) * r(4)) * pz) / det
      val iy = ((r(5) * r(6) - r(3) * r(8)) * px +
                (r(0) * r(8) - r(2) * r(6)) * py +
                (r(2) * r(3) - r(0) * r(5)) * pz) / det
      val iz = ((r(3) * r(7) - r(4) * r(6)) * px +
                (r(1) * r(6) - r(0) * r(7)) * py +
                (r(0) * r(4) - r(1) * r(3)) * pz) / det
      (ix, iy, iz)
    }
  }

  /** Geodetic (rad, rad, m) → geocentric cartesian (m). */
  def geodeticToGeocentric(ell: Ellipsoid, lon: Double, lat: Double,
                           h: Double = 0.0): (Double, Double, Double) = {
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    val n = ell.a / math.sqrt(1 - ell.es * sinLat * sinLat)
    ((n + h) * cosLat * math.cos(lon),
     (n + h) * cosLat * math.sin(lon),
     (n * (1 - ell.es) + h) * sinLat)
  }

  /** Geocentric cartesian → geodetic (rad, rad, m) — Bowring's iteration. */
  def geocentricToGeodetic(ell: Ellipsoid, x: Double, y: Double,
                           z: Double): (Double, Double, Double) = {
    val lon = math.atan2(y, x)
    val p = math.hypot(x, y)
    if (p < 1e-12) {
      val lat = if (z >= 0) math.Pi / 2 else -math.Pi / 2
      return (lon, lat, math.abs(z) - ell.b)
    }
    var lat = math.atan2(z, p * (1 - ell.es))
    var i = 0
    while (i < 8) {
      val sinLat = math.sin(lat)
      val n = ell.a / math.sqrt(1 - ell.es * sinLat * sinLat)
      lat = math.atan2(z + ell.es * n * sinLat, p)
      i += 1
    }
    val sinLat = math.sin(lat)
    val n = ell.a / math.sqrt(1 - ell.es * sinLat * sinLat)
    val h = p / math.cos(lat) - n
    (lon, lat, h)
  }

  // ---------------------------------------------------------------- kernels

  sealed trait Projection {
    def ell: Ellipsoid
    /** lon/lat radians → easting/northing meters (false origin applied). */
    def forward(lon: Double, lat: Double): (Double, Double)
    /** easting/northing meters → lon/lat radians. */
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Geographic "projection": degrees as coordinates. */
  final case class Geographic(ell: Ellipsoid) extends Projection {
    def forward(lon: Double, lat: Double): (Double, Double) =
      (math.toDegrees(lon), math.toDegrees(lat))
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toRadians(x), math.toRadians(y))
  }

  /** Meridian arc length M(φ)·(1/a) — Snyder (3-21) series extended to
    * the e⁸ terms (standard geodesy-text extension; sub-µm agreement with
    * PROJ's pj_mlfn, verified numerically in ProjCrossSpec).
    */
  private def mlfn(es: Double, phi: Double): Double = {
    val es2 = es * es; val es3 = es2 * es; val es4 = es3 * es
    (1 - es / 4 - 3 * es2 / 64 - 5 * es3 / 256 - 175 * es4 / 16384) * phi -
      (3 * es / 8 + 3 * es2 / 32 + 45 * es3 / 1024 + 105 * es4 / 4096) * math.sin(2 * phi) +
      (15 * es2 / 256 + 45 * es3 / 1024 + 525 * es4 / 16384) * math.sin(4 * phi) -
      (35 * es3 / 3072 + 175 * es4 / 12288) * math.sin(6 * phi) +
      (315 * es4 / 131072) * math.sin(8 * phi)
  }

  /** Rectifying-latitude scale: M(π/2)·(2/π)·(1/a) denominator series. */
  private def mlfnK(es: Double): Double = {
    val es2 = es * es; val es3 = es2 * es; val es4 = es3 * es
    1 - es / 4 - 3 * es2 / 64 - 5 * es3 / 256 - 175 * es4 / 16384
  }

  /** Footpoint latitude from rectifying latitude μ — Snyder (3-26). */
  private def invMlfn(es: Double, mu: Double): Double = {
    val e1 = (1 - math.sqrt(1 - es)) / (1 + math.sqrt(1 - es))
    val e12 = e1 * e1; val e13 = e12 * e1; val e14 = e13 * e1
    mu + (3 * e1 / 2 - 27 * e13 / 32) * math.sin(2 * mu) +
      (21 * e12 / 16 - 55 * e14 / 32) * math.sin(4 * mu) +
      (151 * e13 / 96) * math.sin(6 * mu) +
      (1097 * e14 / 512) * math.sin(8 * mu)
  }

  /** Isometric-latitude helper t(φ) — Snyder (15-9). */
  private def tsfn(e: Double, phi: Double): Double = {
    val sinPhi = math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - e * sinPhi) / (1 + e * sinPhi), e / 2)
  }

  /** φ from t by fixed-point iteration — Snyder (7-9). */
  private def invTsfn(e: Double, t: Double): Double = {
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 15) {
      val sinPhi = math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(
        t * math.pow((1 - e * sinPhi) / (1 + e * sinPhi), e / 2))
      if (math.abs(next - phi) < 1e-14) { phi = next; i = 15 }
      else { phi = next; i += 1 }
    }
    phi
  }

  /** m(φ) = cosφ/√(1−e²sin²φ) — Snyder (14-15). */
  private def msfn(es: Double, phi: Double): Double = {
    val sinPhi = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - es * sinPhi * sinPhi)
  }

  /** Transverse Mercator — Snyder (8-9)..(8-17). Accurate to sub-mm
    * within ±4° of the central meridian (the UTM/national-grid regime).
    */
  final case class TMerc(ell: Ellipsoid, lon0Deg: Double, lat0Deg: Double,
                         k0: Double, fe: Double, fn: Double) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private val lat0 = math.toRadians(lat0Deg)
    private val ep2 = ell.es / (1 - ell.es)
    private val m0 = ell.a * mlfn(ell.es, lat0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val sinLat = math.sin(lat); val cosLat = math.cos(lat)
      val n = ell.a / math.sqrt(1 - ell.es * sinLat * sinLat)
      val t = math.tan(lat); val t2 = t * t
      val c = ep2 * cosLat * cosLat
      var dLon = lon - lon0
      while (dLon > math.Pi) dLon -= 2 * math.Pi
      while (dLon < -math.Pi) dLon += 2 * math.Pi
      val aa = dLon * cosLat
      val aa2 = aa * aa; val aa3 = aa2 * aa
      val m = ell.a * mlfn(ell.es, lat)
      val x = k0 * n * (aa + (1 - t2 + c) * aa3 / 6 +
        (5 - 18 * t2 + t2 * t2 + 72 * c - 58 * ep2) * aa3 * aa2 / 120)
      val y = k0 * (m - m0 + n * t * (aa2 / 2 +
        (5 - t2 + 9 * c + 4 * c * c) * aa2 * aa2 / 24 +
        (61 - 58 * t2 + t2 * t2 + 600 * c - 330 * ep2) * aa3 * aa3 / 720))
      (fe + x, fn + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = m0 + (y - fn) / k0
      val mu = m / (ell.a * mlfnK(ell.es))
      val phi1 = invMlfn(ell.es, mu)
      if (math.abs(phi1) >= math.Pi / 2 - 1e-11)
        return (lon0, if (y - fn >= 0) math.Pi / 2 else -math.Pi / 2)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1)
      val c1 = ep2 * cos1 * cos1
      val t1 = math.tan(phi1); val t12 = t1 * t1
      val n1 = ell.a / math.sqrt(1 - ell.es * sin1 * sin1)
      val r1 = ell.a * (1 - ell.es) /
        math.pow(1 - ell.es * sin1 * sin1, 1.5)
      val d = (x - fe) / (n1 * k0)
      val d2 = d * d
      val lat = phi1 - (n1 * t1 / r1) * (d2 / 2 -
        (5 + 3 * t12 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d2 * d2 / 24 +
        (61 + 90 * t12 + 298 * c1 + 45 * t12 * t12 - 252 * ep2 -
          3 * c1 * c1) * d2 * d2 * d2 / 720)
      val lon = lon0 + (d - (1 + 2 * t12 + c1) * d2 * d / 6 +
        (5 - 2 * c1 + 28 * t12 - 3 * c1 * c1 + 8 * ep2 +
          24 * t12 * t12) * d2 * d2 * d / 120) / cos1
      (lon, lat)
    }
  }

  /** Lambert Conformal Conic, 2 standard parallels — Snyder (15-1)..(15-11). */
  final case class Lcc2SP(ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
                          lat0Deg: Double, lon0Deg: Double,
                          fe: Double, fn: Double) extends Projection {
    private val lat1 = math.toRadians(lat1Deg)
    private val lat2 = math.toRadians(lat2Deg)
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val m1 = msfn(ell.es, lat1)
    private val m2 = msfn(ell.es, lat2)
    private val t1 = tsfn(ell.e, lat1)
    private val t2 = tsfn(ell.e, lat2)
    private val t0 = tsfn(ell.e, lat0)
    private val n =
      if (math.abs(lat1 - lat2) < 1e-10) math.sin(lat1)
      else (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    private val f = m1 / (n * math.pow(t1, n))
    private val rho0 = ell.a * f * math.pow(t0, n)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val t = tsfn(ell.e, lat)
      val rho =
        if (math.abs(math.abs(lat) - math.Pi / 2) < 1e-10) 0.0
        else ell.a * f * math.pow(t, n)
      var dLon = lon - lon0
      while (dLon > math.Pi) dLon -= 2 * math.Pi
      while (dLon < -math.Pi) dLon += 2 * math.Pi
      val theta = n * dLon
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = rho0 - (y - fn)
      var rho = math.hypot(dx, dy)
      var theta = math.atan2(dx, dy)
      if (n < 0) { rho = -rho; theta = math.atan2(-dx, -dy) }
      val lon = theta / n + lon0
      if (rho == 0.0)
        return (lon, if (n > 0) math.Pi / 2 else -math.Pi / 2)
      val t = math.pow(rho / (ell.a * f), 1 / n)
      (lon, invTsfn(ell.e, t))
    }
  }

  /** Polar Stereographic (variant A with k0 at the pole, variant B with a
    * standard parallel) — Snyder (21-33)..(21-41).
    *
    * @param latTsDeg standard parallel (±90 = use k0 at the pole)
    * @param south    true for the south-polar aspect
    */
  final case class PolarStereo(ell: Ellipsoid, latTsDeg: Double,
                               lon0Deg: Double, k0: Double,
                               fe: Double, fn: Double,
                               south: Boolean) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    // scale factor: ρ = a·k0·2·t/√((1+e)^(1+e)(1−e)^(1−e)) at the pole,
    // or a·m(φts)·t/t(φts) with a standard parallel (Snyder 21-34/21-35)
    private val rhoF: Double = {
      val absTs = math.abs(latTsDeg)
      if (absTs >= 90 - 1e-9)
        ell.a * k0 * 2 / math.sqrt(
          math.pow(1 + ell.e, 1 + ell.e) * math.pow(1 - ell.e, 1 - ell.e))
      else {
        val ts = math.toRadians(absTs)
        ell.a * msfn(ell.es, ts) / tsfn(ell.e, ts)
      }
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      var lam = lon - lon0
      while (lam > math.Pi) lam -= 2 * math.Pi
      while (lam < -math.Pi) lam += 2 * math.Pi
      // south aspect mirrors the latitude; grid north runs along λ0
      // TOWARD the pole in both aspects (Snyder 21-30 with the southern
      // substitution): north y = −ρcosλ, south y = +ρcosλ
      val t = tsfn(ell.e, if (south) -lat else lat)
      val rho = rhoF * t
      val x = rho * math.sin(lam)
      val y = if (south) rho * math.cos(lam) else -rho * math.cos(lam)
      (fe + x, fn + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = if (south) y - fn else -(y - fn)
      val rho = math.hypot(dx, dy)
      val phiAbs =
        if (rho < 1e-12) math.Pi / 2
        else invTsfn(ell.e, rho / rhoF)
      val lamRel = if (rho < 1e-12) 0.0 else math.atan2(dx, dy)
      (lon0 + lamRel, if (south) -phiAbs else phiAbs)
    }
  }

  /** q(φ) — Snyder (3-12), shared by the equal-area projections.
    * Spherical limit (e→0): the 1/(2e) term tends to −sinφ, so q = 2·sinφ
    * — evaluated directly, because the general form is Inf·0 = NaN on a
    * sphere (EASE-Grid / authalic-sphere LAEA definitions).
    */
  private def qsfn(ell: Ellipsoid, phi: Double): Double = {
    val sinPhi = math.sin(phi)
    val e = ell.e
    if (e == 0.0) 2.0 * sinPhi
    else (1 - ell.es) * (sinPhi / (1 - ell.es * sinPhi * sinPhi) -
      (1 / (2 * e)) * math.log((1 - e * sinPhi) / (1 + e * sinPhi)))
  }

  /** φ from q by Newton iteration — Snyder (3-16); sphere: φ = asin(q/2). */
  private def invQsfn(ell: Ellipsoid, q: Double): Double = {
    val e = ell.e; val es = ell.es
    if (e == 0.0) return math.asin(math.max(-1, math.min(1, q / 2)))
    var phi = math.asin(math.max(-1, math.min(1, q / 2)))
    var i = 0
    while (i < 15) {
      val sinPhi = math.sin(phi); val cosPhi = math.cos(phi)
      val con = 1 - es * sinPhi * sinPhi
      val d = con * con / (2 * cosPhi) * (q / (1 - es) - sinPhi / con +
        (1 / (2 * e)) * math.log((1 - e * sinPhi) / (1 + e * sinPhi)))
      phi += d
      if (math.abs(d) < 1e-14) i = 15 else i += 1
    }
    phi
  }

  /** Albers Equal-Area conic, 2 standard parallels — Snyder
    * (14-1)..(14-21).
    */
  final case class Aea(ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
                       lat0Deg: Double, lon0Deg: Double,
                       fe: Double, fn: Double) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private val m1 = msfn(ell.es, math.toRadians(lat1Deg))
    private val m2 = msfn(ell.es, math.toRadians(lat2Deg))
    private val q1 = qsfn(ell, math.toRadians(lat1Deg))
    private val q2 = qsfn(ell, math.toRadians(lat2Deg))
    private val q0 = qsfn(ell, math.toRadians(lat0Deg))
    private val n =
      if (math.abs(lat1Deg - lat2Deg) < 1e-10) math.sin(math.toRadians(lat1Deg))
      else (m1 * m1 - m2 * m2) / (q2 - q1)
    private val c = m1 * m1 + n * q1
    private val rho0 = ell.a * math.sqrt(c - n * q0) / n

    def forward(lon: Double, lat: Double): (Double, Double) = {
      var dLon = lon - lon0
      while (dLon > math.Pi) dLon -= 2 * math.Pi
      while (dLon < -math.Pi) dLon += 2 * math.Pi
      val rho = ell.a * math.sqrt(c - n * qsfn(ell, lat)) / n
      val theta = n * dLon
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = rho0 - (y - fn)
      var rho = math.hypot(dx, dy)
      var theta = math.atan2(dx, dy)
      if (n < 0) { rho = -rho; theta = math.atan2(-dx, -dy) }
      val lon = theta / n + lon0
      val q = (c - rho * rho * n * n / (ell.a * ell.a)) / n
      (lon, invQsfn(ell, q))
    }
  }

  /** Lambert Azimuthal Equal-Area, ellipsoidal oblique — Snyder
    * (24-3)..(24-29) via authalic latitudes.
    */
  final case class Laea(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                        fe: Double, fn: Double) extends Projection {
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)

    private def qfn(phi: Double): Double = qsfn(ell, phi) // sphere-safe

    private val qp = qfn(math.Pi / 2)
    private val rq = ell.a * math.sqrt(qp / 2)
    private val q0 = qfn(lat0)
    private val beta0 = math.asin(math.max(-1, math.min(1, q0 / qp)))
    private val sinB0 = math.sin(beta0); private val cosB0 = math.cos(beta0)
    // polar aspect (EASE-Grid lat_0=±90): the oblique D = a·m0/(Rq·cosβ0)
    // degenerates (0/0); Snyder 24-23/24-24 use the separate ρ = a·√(qp∓q)
    private val polar = math.abs(lat0Deg) >= 90 - 1e-9
    private val north = lat0Deg > 0
    private val d =
      if (polar) 1.0 else ell.a * msfn(ell.es, lat0) / (rq * cosB0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      if (polar) {
        val q = qfn(lat)
        val rho = ell.a * math.sqrt(math.max(0, if (north) qp - q else qp + q))
        var dLon = lon - lon0
        while (dLon > math.Pi) dLon -= 2 * math.Pi
        while (dLon < -math.Pi) dLon += 2 * math.Pi
        val x = rho * math.sin(dLon)
        val y = if (north) -rho * math.cos(dLon) else rho * math.cos(dLon)
        return (fe + x, fn + y)
      }
      val q = qfn(lat)
      val beta = math.asin(math.max(-1, math.min(1, q / qp)))
      var dLon = lon - lon0
      while (dLon > math.Pi) dLon -= 2 * math.Pi
      while (dLon < -math.Pi) dLon += 2 * math.Pi
      val sinB = math.sin(beta); val cosB = math.cos(beta)
      val denom = 1 + sinB0 * sinB + cosB0 * cosB * math.cos(dLon)
      val bb = rq * math.sqrt(2 / denom)
      val x = bb * d * cosB * math.sin(dLon)
      val y = (bb / d) * (cosB0 * sinB - sinB0 * cosB * math.cos(dLon))
      (fe + x, fn + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      if (polar) {
        val px = x - fe; val py = y - fn
        val rho = math.hypot(px, py)
        val ra = rho / ell.a
        val q = if (north) qp - ra * ra else ra * ra - qp
        val lat = invQsfn(ell, math.max(-qp, math.min(qp, q)))
        val lon =
          if (rho < 1e-12) lon0
          else if (north) lon0 + math.atan2(px, -py)
          else lon0 + math.atan2(px, py)
        return (lon, lat)
      }
      val dx = (x - fe) / d; val dy = (y - fn) * d
      val rho = math.hypot(dx, dy)
      if (rho < 1e-12) return (lon0, lat0)
      val ce = 2 * math.asin(math.max(-1, math.min(1, rho / (2 * rq))))
      val sinCe = math.sin(ce); val cosCe = math.cos(ce)
      val beta = math.asin(math.max(-1, math.min(1,
        cosCe * sinB0 + dy * sinCe * cosB0 / rho)))
      val lon = lon0 + math.atan2(dx * sinCe,
        rho * cosB0 * cosCe - dy * sinB0 * sinCe)
      // authalic → geodetic latitude (Snyder 3-18)
      val es = ell.es; val es2 = es * es; val es3 = es2 * es
      val lat = beta +
        (es / 3 + 31 * es2 / 180 + 517 * es3 / 5040) * math.sin(2 * beta) +
        (23 * es2 / 360 + 251 * es3 / 3780) * math.sin(4 * beta) +
        (761 * es3 / 45360) * math.sin(6 * beta)
      (lon, lat)
    }
  }

  // ------------------------------------------------------------------ CRS

  /** A CRS = projection (carrying its ellipsoid) + optional datum shift to
    * WGS84 (None = datum is WGS84-equivalent at this engine's accuracy —
    * true for WGS84 itself and, to <1 m, ETRS89/RGF93/NAD83).
    * `unitToMeter` is the projected coordinate unit (1.0 = metres,
    * 1200.0/3937 = US survey feet for state-plane CRSes); the kernels run
    * in metres, coordinates are exchanged in the CRS's native unit
    * (PROJ's `fr_meter` scaling, `+units=`/`+to_meter=`). Always 1.0 for
    * geographic CRSes (coordinates in degrees).
    */
  final case class Crs(epsg: Int, proj: Projection, toWgs84: Option[Helmert],
                       unitToMeter: Double = 1.0)

  /** OSGB36 → WGS84 position-vector parameters (EPSG transformation 1314). */
  val Osgb36ToWgs84: Helmert =
    Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

  def byEpsg(code: Int): Option[Crs] = code match {
    case 4326 => Some(Crs(code, Geographic(WGS84), None))
    case 4258 => Some(Crs(code, Geographic(GRS80), None)) // ETRS89
    case 4277 => // OSGB36 geographic
      Some(Crs(code, Geographic(Airy1830), Some(Osgb36ToWgs84)))
    case utm if utm >= 32601 && utm <= 32660 => // UTM north, WGS84
      val zone = utm - 32600
      Some(Crs(code, TMerc(WGS84, zone * 6 - 183, 0, 0.9996, 500000, 0), None))
    case utm if utm >= 32701 && utm <= 32760 => // UTM south, WGS84
      val zone = utm - 32700
      Some(Crs(code, TMerc(WGS84, zone * 6 - 183, 0, 0.9996, 500000, 10000000), None))
    case utm if utm >= 25828 && utm <= 25838 => // ETRS89 / UTM (Europe)
      val zone = utm - 25800
      Some(Crs(code, TMerc(GRS80, zone * 6 - 183, 0, 0.9996, 500000, 0), None))
    case 27700 => // British National Grid (Airy 1830, OSGB36 datum)
      Some(Crs(code,
        TMerc(Airy1830, -2, 49, 0.9996012717, 400000, -100000),
        Some(Osgb36ToWgs84)))
    case 2154 => // RGF93 / Lambert-93
      Some(Crs(code, Lcc2SP(GRS80, 49, 44, 46.5, 3, 700000, 6600000), None))
    case 3413 => // WGS84 / NSIDC Sea Ice Polar Stereographic North
      Some(Crs(code, PolarStereo(WGS84, 70, -45, 1.0, 0, 0, south = false), None))
    case 3031 => // WGS84 / Antarctic Polar Stereographic
      Some(Crs(code, PolarStereo(WGS84, -71, 0, 1.0, 0, 0, south = true), None))
    case 5041 => // WGS84 / UPS North
      Some(Crs(code, PolarStereo(WGS84, 90, 0, 0.994, 2000000, 2000000, south = false), None))
    case 5042 => // WGS84 / UPS South
      Some(Crs(code, PolarStereo(WGS84, -90, 0, 0.994, 2000000, 2000000, south = true), None))
    case 3035 => // ETRS89-extended / LAEA Europe
      Some(Crs(code, Laea(GRS80, 52, 10, 4321000, 3210000), None))
    case 5070 => // NAD83 / Conus Albers (NAD83 ≈ WGS84 at this accuracy)
      Some(Crs(code, Aea(GRS80, 29.5, 45.5, 23, -96, 0, 0), None))
    case _ => None
  }

  /** Transform a single coordinate between two EPSG CRSes. Input and
    * output are in each CRS's native units (degrees for geographic,
    * meters for projected).
    */
  def transformPoint(src: Crs, dst: Crs, x: Double, y: Double): (Double, Double) = {
    // epsg 0 marks a parsed (PROJ.4/WKT) definition with no authority code —
    // two such CRSes are not necessarily identical
    if (src.epsg == dst.epsg && src.epsg != 0) return (x, y)
    val (lonS, latS) = src.proj.inverse(x * src.unitToMeter, y * src.unitToMeter)
    val (lonD, latD) =
      if (src.toWgs84 == dst.toWgs84) (lonS, latS) // same datum: skip shift
      else {
        // src datum → WGS84 → dst datum through geocentric XYZ
        val (wx, wy, wz) = {
          val (gx, gy, gz) = geodeticToGeocentric(src.proj.ell, lonS, latS)
          src.toWgs84 match {
            case Some(h) => h.forward(gx, gy, gz)
            case None => (gx, gy, gz)
          }
        }
        val (dx, dy, dz) = dst.toWgs84 match {
          case Some(h) => h.inverse(wx, wy, wz)
          case None => (wx, wy, wz)
        }
        val (lo, la, _) = geocentricToGeodetic(dst.proj.ell, dx, dy, dz)
        (lo, la)
      }
    val (ox, oy) = dst.proj.forward(lonD, latD)
    if (dst.unitToMeter == 1.0) (ox, oy)
    else (ox / dst.unitToMeter, oy / dst.unitToMeter)
  }
}
