#!/usr/bin/env python3
"""Independent CRS-transform oracle for q_transform_utm.

Implements the projection kernels with DIFFERENT public formulations than
the Scala engine (PROJ.4-style Evenden series for transverse mercator vs
Snyder 8-9..8-17 in Scala; independently coded LCC / polar stereographic /
LAEA / Helmert), so agreement between the two is genuine cross-validation,
not a shared transcription.

Outputs:
  --tsv    full-precision TSV (pair, pid, x, y) for /tmp cross-checks
  --values pinned SQL VALUES block (rounded to 4 decimals) for oracleSql
"""
import math
import sys

# --- ellipsoids (a, 1/f) ---
ELL = {
    "wgs84": (6378137.0, 298.257223563),
    "grs80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.978698214),
}


def es_of(name):
    a, invf = ELL[name]
    f = 1.0 / invf
    return a, f * (2 - f)


# --- PROJ.4-style meridian arc (pj_enfn / pj_mlfn / pj_inv_mlfn) ---
C00, C02, C04, C06, C08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
C22 = 0.75
C44, C46, C48 = 0.46875, 0.013020833333333333, 0.007120768229166667
C66, C68 = 0.3645833333333333, 0.005696614583333333
C88 = 0.3076171875


def enfn(es):
    return (
        C00 - es * (C02 + es * (C04 + es * (C06 + es * C08))),
        es * (C22 - es * (C04 + es * (C06 + es * C08))),
        es * es * (C44 - es * (C46 + es * C48)),
        es ** 3 * (C66 - es * C68),
        es ** 4 * C88,
    )


def mlfn(phi, sphi, cphi, en):
    cphi *= sphi
    sphi *= sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi * (en[3] + sphi * en[4])))


def inv_mlfn(arg, es, en):
    k = 1.0 / (1.0 - es)
    phi = arg
    for _ in range(15):
        s = math.sin(phi)
        t = 1.0 - es * s * s
        t = (mlfn(phi, s, math.cos(phi), en) - arg) * t * math.sqrt(t) * k
        phi -= t
        if abs(t) < 1e-15:
            break
    return phi


FC1, FC2, FC3, FC4 = 1.0, 0.5, 1.0 / 6, 1.0 / 12
FC5, FC6, FC7, FC8 = 1.0 / 20, 1.0 / 30, 1.0 / 42, 1.0 / 56


class TMerc:
    """PROJ.4 pj_tmerc.c approx (Evenden) kernel — NOT the Snyder series."""

    def __init__(self, ell, lon0, lat0, k0, fe, fn):
        self.a, self.es = es_of(ell)
        self.e = math.sqrt(self.es)
        self.esp = self.es / (1 - self.es)
        self.en = enfn(self.es)
        self.lam0 = math.radians(lon0)
        self.k0, self.fe, self.fn = k0, fe, fn
        p0 = math.radians(lat0)
        self.ml0 = mlfn(p0, math.sin(p0), math.cos(p0), self.en)

    def fwd(self, lon, lat):
        lam = lon - self.lam0
        while lam > math.pi:
            lam -= 2 * math.pi
        while lam < -math.pi:
            lam += 2 * math.pi
        sphi, cphi = math.sin(lat), math.cos(lat)
        t = sphi / cphi if abs(cphi) > 1e-10 else 0.0
        t *= t
        al = cphi * lam
        als = al * al
        al /= math.sqrt(1 - self.es * sphi * sphi)
        n = self.esp * cphi * cphi
        x = self.k0 * al * (FC1 + FC3 * als * (1 - t + n + FC5 * als * (
            5 + t * (t - 18) + n * (14 - 58 * t) + FC7 * als * (
                61 + t * (t * (179 - t) - 479)))))
        y = self.k0 * (mlfn(lat, sphi, cphi, self.en) - self.ml0 +
                       sphi * al * lam * FC2 * (1 + FC4 * als * (
                           5 - t + n * (9 + 4 * n) + FC6 * als * (
                               61 + t * (t - 58) + n * (270 - 330 * t) +
                               FC8 * als * (1385 + t * (t * (543 - t) - 3111))))))
        return self.fe + self.a * x, self.fn + self.a * y

    def inv(self, x, y):
        x = (x - self.fe) / self.a
        y = (y - self.fn) / self.a
        phi = inv_mlfn(self.ml0 + y / self.k0, self.es, self.en)
        if abs(phi) >= math.pi / 2:
            return self.lam0, math.copysign(math.pi / 2, y)
        sphi, cphi = math.sin(phi), math.cos(phi)
        t = sphi / cphi if abs(cphi) > 1e-10 else 0.0
        n = self.esp * cphi * cphi
        con = 1 - self.es * sphi * sphi
        d = x * math.sqrt(con) / self.k0
        con *= t
        t *= t
        ds = d * d
        lat = phi - (con * ds / (1 - self.es)) * FC2 * (1 - ds * FC4 * (
            5 + t * (3 - 9 * n) + n * (1 - 4 * n) - ds * FC6 * (
                61 + t * (90 - 252 * n + 45 * t) + 46 * n - ds * FC8 * (
                    1385 + t * (3633 + t * (4095 + 1574 * t))))))
        lon = self.lam0 + d * (FC1 - ds * FC3 * (1 + 2 * t + n - ds * FC5 * (
            5 + t * (28 + 24 * t + 8 * n) + 6 * n - ds * FC7 * (
                61 + t * (662 + t * (1320 + 720 * t)))))) / cphi
        return lon, lat


def tsfn(e, phi):
    s = e * math.sin(phi)
    return math.tan(0.5 * (math.pi / 2 - phi)) / ((1 - s) / (1 + s)) ** (e / 2)


def inv_tsfn(e, ts):
    phi = math.pi / 2 - 2 * math.atan(ts)
    for _ in range(15):
        s = e * math.sin(phi)
        nphi = math.pi / 2 - 2 * math.atan(ts * ((1 - s) / (1 + s)) ** (e / 2))
        if abs(nphi - phi) < 1e-14:
            return nphi
        phi = nphi
    return phi


def msfn(es, phi):
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1 - es * s * s)


class Lcc:
    def __init__(self, ell, lat1, lat2, lat0, lon0, fe, fn):
        self.a, self.es = es_of(ell)
        self.e = math.sqrt(self.es)
        p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
        self.lam0 = math.radians(lon0)
        m1, m2 = msfn(self.es, p1), msfn(self.es, p2)
        t1, t2, t0 = tsfn(self.e, p1), tsfn(self.e, p2), tsfn(self.e, p0)
        self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2)) \
            if abs(p1 - p2) > 1e-10 else math.sin(p1)
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = self.a * self.F * t0 ** self.n
        self.fe, self.fn_ = fe, fn

    def fwd(self, lon, lat):
        lam = lon - self.lam0
        while lam > math.pi:
            lam -= 2 * math.pi
        while lam < -math.pi:
            lam += 2 * math.pi
        rho = 0.0 if abs(abs(lat) - math.pi / 2) < 1e-10 else \
            self.a * self.F * tsfn(self.e, lat) ** self.n
        th = self.n * lam
        return self.fe + rho * math.sin(th), self.fn_ + self.rho0 - rho * math.cos(th)

    def inv(self, x, y):
        dx, dy = x - self.fe, self.rho0 - (y - self.fn_)
        rho = math.hypot(dx, dy)
        th = math.atan2(dx, dy)
        if self.n < 0:
            rho, th = -rho, math.atan2(-dx, -dy)
        lon = th / self.n + self.lam0
        if rho == 0:
            return lon, math.copysign(math.pi / 2, self.n)
        return lon, inv_tsfn(self.e, (rho / (self.a * self.F)) ** (1 / self.n))


class PolarStereo:
    def __init__(self, ell, lat_ts, lon0, k0, fe, fn, south):
        self.a, self.es = es_of(ell)
        self.e = math.sqrt(self.es)
        self.lam0 = math.radians(lon0)
        self.fe, self.fn_, self.south = fe, fn, south
        ats = abs(lat_ts)
        if ats >= 90 - 1e-9:
            self.rf = self.a * k0 * 2 / math.sqrt(
                (1 + self.e) ** (1 + self.e) * (1 - self.e) ** (1 - self.e))
        else:
            ts = math.radians(ats)
            self.rf = self.a * msfn(self.es, ts) / tsfn(self.e, ts)

    def fwd(self, lon, lat):
        lam = lon - self.lam0
        while lam > math.pi:
            lam -= 2 * math.pi
        while lam < -math.pi:
            lam += 2 * math.pi
        rho = self.rf * tsfn(self.e, -lat if self.south else lat)
        x = rho * math.sin(lam)
        y = rho * math.cos(lam) if self.south else -rho * math.cos(lam)
        return self.fe + x, self.fn_ + y

    def inv(self, x, y):
        dx = x - self.fe
        dy = (y - self.fn_) if self.south else -(y - self.fn_)
        rho = math.hypot(dx, dy)
        phi = math.pi / 2 if rho < 1e-12 else inv_tsfn(self.e, rho / self.rf)
        lam = 0.0 if rho < 1e-12 else math.atan2(dx, dy)
        return self.lam0 + lam, -phi if self.south else phi


class Laea:
    def __init__(self, ell, lat0, lon0, fe, fn):
        self.a, self.es = es_of(ell)
        self.e = math.sqrt(self.es)
        self.lam0 = math.radians(lon0)
        self.fe, self.fn_ = fe, fn
        p0 = math.radians(lat0)
        self.qp = self._q(math.pi / 2)
        self.rq = self.a * math.sqrt(self.qp / 2)
        b0 = math.asin(min(1, max(-1, self._q(p0) / self.qp)))
        self.sb0, self.cb0 = math.sin(b0), math.cos(b0)
        self.d = self.a * msfn(self.es, p0) / (self.rq * self.cb0)

    def _q(self, phi):
        s = math.sin(phi)
        return (1 - self.es) * (s / (1 - self.es * s * s) -
                                (1 / (2 * self.e)) * math.log((1 - self.e * s) / (1 + self.e * s)))

    def fwd(self, lon, lat):
        lam = lon - self.lam0
        while lam > math.pi:
            lam -= 2 * math.pi
        while lam < -math.pi:
            lam += 2 * math.pi
        b = math.asin(min(1, max(-1, self._q(lat) / self.qp)))
        sb, cb = math.sin(b), math.cos(b)
        denom = 1 + self.sb0 * sb + self.cb0 * cb * math.cos(lam)
        bb = self.rq * math.sqrt(2 / denom)
        return (self.fe + bb * self.d * cb * math.sin(lam),
                self.fn_ + (bb / self.d) * (self.cb0 * sb - self.sb0 * cb * math.cos(lam)))

    def inv(self, x, y):
        dx, dy = (x - self.fe) / self.d, (y - self.fn_) * self.d
        rho = math.hypot(dx, dy)
        if rho < 1e-12:
            return self.lam0, math.asin(self.sb0)
        ce = 2 * math.asin(min(1, max(-1, rho / (2 * self.rq))))
        sce, cce = math.sin(ce), math.cos(ce)
        b = math.asin(min(1, max(-1, cce * self.sb0 + dy * sce * self.cb0 / rho)))
        lon = self.lam0 + math.atan2(dx * sce, rho * self.cb0 * cce - dy * self.sb0 * sce)
        es, es2, es3 = self.es, self.es ** 2, self.es ** 3
        lat = b + (es / 3 + 31 * es2 / 180 + 517 * es3 / 5040) * math.sin(2 * b) + \
            (23 * es2 / 360 + 251 * es3 / 3780) * math.sin(4 * b) + \
            (761 * es3 / 45360) * math.sin(6 * b)
        return lon, lat


def qsfn(a_es, e, phi):
    s_ = math.sin(phi)
    es = a_es
    return (1 - es) * (s_ / (1 - es * s_ * s_) -
                       (1 / (2 * e)) * math.log((1 - e * s_) / (1 + e * s_)))


class Aea:
    """Albers equal-area 2SP, independently coded from Snyder 14-1..14-21."""

    def __init__(self, ell, lat1, lat2, lat0, lon0, fe, fn):
        self.a, self.es = es_of(ell)
        self.e = math.sqrt(self.es)
        p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
        self.lam0 = math.radians(lon0)
        m1, m2 = msfn(self.es, p1), msfn(self.es, p2)
        q1 = qsfn(self.es, self.e, p1)
        q2 = qsfn(self.es, self.e, p2)
        q0 = qsfn(self.es, self.e, p0)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.c = m1 * m1 + self.n * q1
        self.rho0 = self.a * math.sqrt(self.c - self.n * q0) / self.n
        self.fe, self.fn_ = fe, fn

    def fwd(self, lon, lat):
        lam = lon - self.lam0
        while lam > math.pi:
            lam -= 2 * math.pi
        while lam < -math.pi:
            lam += 2 * math.pi
        rho = self.a * math.sqrt(self.c - self.n * qsfn(self.es, self.e, lat)) / self.n
        th = self.n * lam
        return self.fe + rho * math.sin(th), self.fn_ + self.rho0 - rho * math.cos(th)

    def inv(self, x, y):
        dx, dy = x - self.fe, self.rho0 - (y - self.fn_)
        rho = math.hypot(dx, dy)
        th = math.atan2(dx, dy)
        if self.n < 0:
            rho, th = -rho, math.atan2(-dx, -dy)
        lon = th / self.n + self.lam0
        q = (self.c - rho * rho * self.n * self.n / (self.a * self.a)) / self.n
        phi = math.asin(min(1, max(-1, q / 2)))
        for _ in range(15):
            s_, c_ = math.sin(phi), math.cos(phi)
            con = 1 - self.es * s_ * s_
            d = con * con / (2 * c_) * (q / (1 - self.es) - s_ / con +
                (1 / (2 * self.e)) * math.log((1 - self.e * s_) / (1 + self.e * s_)))
            phi += d
            if abs(d) < 1e-14:
                break
        return lon, phi


class Geographic:
    def __init__(self, ell):
        self.a, self.es = es_of(ell)

    def fwd(self, lon, lat):
        return math.degrees(lon), math.degrees(lat)

    def inv(self, x, y):
        return math.radians(x), math.radians(y)


# --- helmert through geocentric, independently coded ---
OSGB_H = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)


def geod_to_xyz(a, es, lon, lat, h=0.0):
    s, c = math.sin(lat), math.cos(lat)
    n = a / math.sqrt(1 - es * s * s)
    return ((n + h) * c * math.cos(lon), (n + h) * c * math.sin(lon),
            (n * (1 - es) + h) * s)


def xyz_to_geod(a, es, x, y, z):
    lon = math.atan2(y, x)
    p = math.hypot(x, y)
    lat = math.atan2(z, p * (1 - es))
    for _ in range(8):
        s = math.sin(lat)
        n = a / math.sqrt(1 - es * s * s)
        lat = math.atan2(z + es * n * s, p)
    return lon, lat


def helmert_fwd(prm, x, y, z):
    tx, ty, tz, rx, ry, rz, ds = prm
    s = 1 + ds * 1e-6
    rx, ry, rz = (math.radians(v / 3600) for v in (rx, ry, rz))
    return (tx + s * (x - rz * y + ry * z),
            ty + s * (rz * x + y - rx * z),
            tz + s * (-ry * x + rx * y + z))


def helmert_inv(prm, x, y, z):
    # iterate the forward map (independent of the Scala exact-Cramer route)
    tx, ty, tz, rx, ry, rz, ds = prm
    gx, gy, gz = x - tx, y - ty, z - tz
    for _ in range(10):
        fx, fy, fz = helmert_fwd(prm, gx, gy, gz)
        gx += x - fx
        gy += y - fy
        gz += z - fz
    return gx, gy, gz


CRS = {
    4326: ("wgs84", Geographic("wgs84"), None),
    32631: ("wgs84", TMerc("wgs84", 3, 0, 0.9996, 500000, 0), None),
    32733: ("wgs84", TMerc("wgs84", 15, 0, 0.9996, 500000, 10000000), None),
    25832: ("grs80", TMerc("grs80", 9, 0, 0.9996, 500000, 0), None),
    27700: ("airy", TMerc("airy", -2, 49, 0.9996012717, 400000, -100000), OSGB_H),
    2154: ("grs80", Lcc("grs80", 49, 44, 46.5, 3, 700000, 6600000), None),
    3413: ("wgs84", PolarStereo("wgs84", 70, -45, 1.0, 0, 0, False), None),
    3031: ("wgs84", PolarStereo("wgs84", -71, 0, 1.0, 0, 0, True), None),
    5041: ("wgs84", PolarStereo("wgs84", 90, 0, 0.994, 2000000, 2000000, False), None),
    3035: ("grs80", Laea("grs80", 52, 10, 4321000, 3210000), None),
    5070: ("grs80", Aea("grs80", 29.5, 45.5, 23, -96, 0, 0), None),
}


def transform(src, dst, x, y):
    se, sp, sh = CRS[src]
    de, dp, dh = CRS[dst]
    lon, lat = sp.inv(x, y)
    if sh != dh:
        a, es = es_of(se)
        gx, gy, gz = geod_to_xyz(a, es, lon, lat)
        if sh is not None:
            gx, gy, gz = helmert_fwd(sh, gx, gy, gz)
        if dh is not None:
            gx, gy, gz = helmert_inv(dh, gx, gy, gz)
        a2, es2 = es_of(de)
        lon, lat = xyz_to_geod(a2, es2, gx, gy, gz)
    return dp.fwd(lon, lat)


# Deterministic test points: (pid, dst_epsg, lon, lat) — all src = 4326
# except the two projected→projected rows at the end.
POINTS = [
    (1, 32631, 2.3522, 48.8566),    # Paris in UTM 31N
    (2, 32631, 5.37, 43.30),        # Marseille
    (3, 32631, 0.1278, 51.5074),    # London edge of zone 31
    (4, 32733, 13.23, -8.83),       # Luanda in UTM 33S
    (5, 32733, 17.08, -22.57),      # Windhoek
    (6, 25832, 8.68, 50.11),        # Frankfurt in ETRS89/UTM32
    (7, 27700, -0.1276, 51.5072),   # London in BNG (datum shift)
    (8, 27700, -3.1883, 55.9533),   # Edinburgh
    (9, 2154, 2.3522, 48.8566),     # Paris in Lambert-93
    (10, 2154, -1.5536, 47.2184),   # Nantes
    (11, 3413, -45.0, 70.0),        # Greenland PS north
    (12, 3413, -30.0, 78.0),
    (13, 3031, 0.0, -75.0),         # Antarctic PS
    (14, 3031, 166.67, -77.85),     # McMurdo
    (15, 5041, 10.0, 85.0),         # UPS north
    (16, 3035, 10.0, 52.0),         # LAEA Europe center-ish
    (17, 3035, -3.70, 40.42),       # Madrid in LAEA
    (20, 5070, -96.0, 35.0),        # CONUS Albers central meridian
    (21, 5070, -118.24, 34.05),     # Los Angeles
]
PROJ2PROJ = [
    (18, 32631, 2154, 652000.0, 5420000.0),   # UTM31 → Lambert-93
    (19, 27700, 4326, 530000.0, 180000.0),    # BNG → WGS84 (datum shift back)
]


def rows():
    out = []
    for pid, dst, lon, lat in POINTS:
        x, y = transform(4326, dst, lon, lat)
        out.append((pid, dst, x, y))
    for pid, src, dst, x0, y0 in PROJ2PROJ:
        x, y = transform(src, dst, x0, y0)
        out.append((pid, dst, x, y))
    return out


def warp_rows():
    """Independent nearest-neighbor warp of a closed-form 20x20 4326 grid
    (lon 3..8, lat 45..50, 0.25 deg pixels, v=(x*31+y*17)%23) to a 14x20
    EPSG:32631 grid (origin 500000/5530000, 25 km pixels), using the
    PROJ.4-style tmerc inverse. Mirrors the engine's pull mapping:
    dst pixel center -> geo -> src affine inverse -> floor."""
    sw = sh = 20
    tm = CRS[32631][1]
    out = []
    for dy in range(20):
        for dx in range(14):
            e = 500000.0 + (dx + 0.5) * 25000.0
            n = 5530000.0 - (dy + 0.5) * 25000.0
            lon, lat = tm.inv(e, n)
            lon, lat = math.degrees(lon), math.degrees(lat)
            px = (lon - 3.0) / 0.25
            py = (50.0 - lat) / 0.25
            # guard: stay far from integer boundaries so double noise
            # between the two tmerc ports cannot flip the floor
            for v in (px, py):
                frac = v - math.floor(v)
                assert min(frac, 1 - frac) > 1e-6, (dx, dy, v)
            ix, iy = math.floor(px), math.floor(py)
            v = float((ix * 31 + iy * 17) % 23) if 0 <= ix < sw and 0 <= iy < sh else -1.0
            out.append((dx, dy, v))
    return out


# --- custom (non-EPSG-table) SRS oracle for q_transform_srs -----------
# Each entry mirrors a PROJ.4-string / WKT definition the Scala SrsParse
# front-end must produce; kernels here remain the independent PROJ.4-style
# formulations, so agreement cross-validates parser + kernels together.
INTL_H = (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
SRS_CUSTOM = {
    # +proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 +ellps=intl
    #   +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7  (GK zone 3 style)
    "gk3": ("intl", TMerc("intl", 9, 0, 1.0, 3500000, 0), INTL_H),
    # +proj=lcc +lat_1=34.0333 +lat_2=35.4666 +lat_0=33.5 +lon_0=-118
    #   +x_0=2000000 +y_0=500000 +ellps=GRS80  (state-plane CA-5 style)
    "spcs": ("grs80", Lcc("grs80", 34.0333, 35.4666, 33.5, -118,
                          2000000, 500000), None),
    # +proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84
    "gls": ("wgs84", PolarStereo("wgs84", 71, -39, 1.0, 0, 0, False), None),
    # +proj=aea +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96 +x_0=0 +y_0=0
    #   +ellps=clrk66  (NA Albers on Clarke 1866)
    "naa": ("clrk66", Aea("clrk66", 20, 60, 40, -96, 0, 0), None),
    # +proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +ellps=WGS84
    "nalaea": ("wgs84", Laea("wgs84", 45, -100, 0, 0), None),
    # WKT PROJCS Transverse_Mercator on airy with TOWGS84 (BNG definition
    # spelled as WKT rather than an EPSG code)
    "bngwkt": ("airy", TMerc("airy", -2, 49, 0.9996012717, 400000, -100000),
               OSGB_H),
}

# --- feet-based CRSes: kernels run in metres, exchanged coordinates are
# in the CRS unit (PROJ fr_meter). US survey foot = 1200/3937 m exactly.
USFT = 1200.0 / 3937.0
SRS_UNIT = {
    # +proj=lcc +lat_1=34.0333 +lat_2=35.4666 +lat_0=33.5 +lon_0=-118
    #   +x_0=2000000 +y_0=500000 +ellps=GRS80 +units=us-ft
    # (+x_0/+y_0 stay metres; only the output is in feet)
    "spcsft": ("grs80", Lcc("grs80", 34.0333, 35.4666, 33.5, -118,
                            2000000, 500000), None, USFT),
    # WKT1 PROJCS with UNIT["US survey foot", 1200/3937]: false easting /
    # northing are expressed IN FEET (2000000 ft / 500000 ft), coordinates
    # exchanged in feet
    "spcswkt": ("grs80", Lcc("grs80", 34.0333, 35.4666, 33.5, -118,
                             2000000 * USFT, 500000 * USFT), None, USFT),
}
SRS_CUSTOM.update({k: v[:3] for k, v in SRS_UNIT.items()})


def srs_transform(dst_key, lon, lat):
    de, dp, dh = SRS_CUSTOM[dst_key]
    u = SRS_UNIT[dst_key][3] if dst_key in SRS_UNIT else 1.0
    if dh is not None:
        a, es = es_of("wgs84")
        gx, gy, gz = geod_to_xyz(a, es, math.radians(lon), math.radians(lat))
        gx, gy, gz = helmert_inv(dh, gx, gy, gz)
        a2, es2 = es_of(de)
        lonr, latr = xyz_to_geod(a2, es2, gx, gy, gz)
        x, y = dp.fwd(lonr, latr)
    else:
        x, y = dp.fwd(math.radians(lon), math.radians(lat))
    return x / u, y / u


SRS_POINTS = [
    (1, "gk3", 9.18, 48.78),        # Stuttgart in GK3
    (2, "gk3", 11.58, 48.14),       # Munich
    (3, "spcs", -118.24, 34.05),    # Los Angeles in CA-5-style LCC
    (4, "spcs", -119.70, 34.42),    # Santa Barbara
    (5, "gls", -39.0, 72.0),        # central Greenland PS
    (6, "gls", -51.7, 64.18),       # Nuuk
    (7, "naa", -96.0, 40.0),        # Albers center
    (8, "naa", -75.16, 39.95),      # Philadelphia
    (9, "nalaea", -100.0, 45.0),    # LAEA center
    (10, "nalaea", -122.33, 47.61), # Seattle
    (11, "bngwkt", -0.1276, 51.5072),  # London via WKT BNG
    (12, "bngwkt", -3.1883, 55.9533),  # Edinburgh
    (13, "spcsft", -118.24, 34.05),    # LA in state-plane US feet (+units=)
    (14, "spcsft", -119.70, 34.42),    # Santa Barbara
    (15, "spcswkt", -118.24, 34.05),   # LA via WKT1 UNIT["US survey foot"]
    (16, "spcswkt", -119.70, 34.42),   # Santa Barbara
]


def srs_rows():
    out = []
    for pid, key, lon, lat in SRS_POINTS:
        x, y = srs_transform(key, lon, lat)
        out.append((pid, key, x, y))
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "--tsv"
    if mode == "--srs":
        print("SELECT * FROM (VALUES")
        body = ",\n".join(
            f"  (CAST({pid} AS BIGINT), '{key}', "
            f"CAST({round(x, 4)} AS DOUBLE), CAST({round(y, 4)} AS DOUBLE))"
            for pid, key, x, y in srs_rows())
        print(body)
        print(") AS t(pid, tag, x_r, y_r)")
        sys.exit(0)
    if mode == "--srs-tsv":
        for pid, key, x, y in srs_rows():
            print(f"{pid}\t{key}\t{x!r}\t{y!r}")
        sys.exit(0)
    if mode == "--warp":
        ws = warp_rows()
        print("SELECT * FROM (VALUES")
        print(",\n".join(f"  ({x}, {y}, CAST({v} AS DOUBLE))" for x, y, v in ws))
        print(") AS t(x, y, v)")
        sys.exit(0)
    rs = rows()
    if mode == "--tsv":
        for pid, dst, x, y in rs:
            print(f"{pid}\t{dst}\t{x!r}\t{y!r}")
    else:
        print("SELECT * FROM (VALUES")
        # geographic outputs keep 8 decimals (~1 mm); projected keep 4 (0.1 mm)
        body = ",\n".join(
            f"  (CAST({pid} AS BIGINT), CAST({dst} AS INTEGER), "
            f"CAST({round(x, 8 if dst == 4326 else 4)} AS DOUBLE), "
            f"CAST({round(y, 8 if dst == 4326 else 4)} AS DOUBLE))"
            for pid, dst, x, y in rs)
        print(body)
        print(") AS t(pid, epsg, x_r, y_r)")
