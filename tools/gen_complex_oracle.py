#!/usr/bin/env python3
"""Independent oracle for q_translate_complex.

Recomputes, in plain Python, the complex-pixel-family results the Scala
engine must produce for the deterministic 37x23 CFloat32 fixture:
GDALCopyWords complex casts (component-wise symmetric-round-clamp for
signed integer targets, real-part extraction for complex->real, zero imaginary
for real->complex), GDALChecksumImage over interleaved re/im words, and
ComputeStatistics over the REAL component (GDAL 2.1 reads pData[2*i]
for complex types - gdalrasterband.cpp:3718-3731).

Rules mirrored from /root/reference/gdal/gcore/rasterio.cpp
(GDALCopyWordsComplexT / GDALCopyWordsComplexOutT dispatch) and
/root/reference/gdal/alg/gdalchecksum.cpp:60-166.
"""
import math

W, H = 37, 23
PRIMES = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]


def re_of(x, y):
    return ((x * 31 + y * 17) % 23) * 1.5 - 7.0


def im_of(x, y):
    return ((x * 13 + y * 29) % 19) * -2.25 + 3.0


def to_int16(v):
    # GDALCopyWord double->short (gdal_priv_templates.hpp:247-255):
    # round half AWAY from zero, clamp, C-cast truncation
    s = v + 0.5 if v > 0 else v - 0.5
    if s < -32768:
        return -32768
    if s > 32767:
        return 32767
    return int(s)  # trunc toward zero like C cast


def to_int32(v):
    # GDALCopyWord double->int (gdal_priv_templates.hpp:237-245):
    # symmetric rounding, clamp at int min/max, C-cast truncation
    s = v + 0.5 if v >= 0 else v - 0.5
    if s < -2147483648.0:
        return -2147483648
    if s > 2147483647.0:
        return 2147483647
    return int(s)


def cks_int(words):
    c = 0
    for i, v in enumerate(words):
        c += int(math.fmod(v, PRIMES[i % 11]))  # C trunc remainder
        c &= 0xFFFF
    return c


def cks_float(words):
    c = 0
    for i, v in enumerate(words):
        s = v + 0.5
        if s < -2147483647.0:
            n = -2147483647
        elif s > 2147483647.0:
            n = 2147483647
        else:
            n = math.floor(s)
        c += int(math.fmod(n, PRIMES[i % 11]))
        c &= 0xFFFF
    return c


def interleave(re, im):
    out = []
    for a, b in zip(re, im):
        out.append(a)
        out.append(b)
    return out


re_plane = [re_of(x, y) for y in range(H) for x in range(W)]
im_plane = [im_of(x, y) for y in range(H) for x in range(W)]

# 1. checksum of the CFloat32 source (float path, interleaved)
cs_cfloat32 = cks_float(interleave(re_plane, im_plane))

# 2. -ot CInt16: component-wise CopyWords, then int checksum
re16 = [to_int16(v) for v in re_plane]
im16 = [to_int16(v) for v in im_plane]
cs_cint16 = cks_int(interleave(re16, im16))

# 3. -ot Int16 (complex->real: take the real component)
cs_real_int16 = cks_int(re16)

# 4. real Int16 plane -> CInt32 (real->complex: imaginary = 0)
cs_cint32_promoted = cks_int(interleave(re16, [0] * len(re16)))

# 5. statistics over the real component of the CFloat32 source
mn, mx = min(re_plane), max(re_plane)
n = len(re_plane)
mean = sum(re_plane) / n
var = sum((v - mean) ** 2 for v in re_plane) / n
std = math.sqrt(var)

rows = [
    ("cs_cfloat32", float(cs_cfloat32)),
    ("cs_cint16", float(cs_cint16)),
    ("cs_real_int16", float(cs_real_int16)),
    ("cs_cint32_promoted", float(cs_cint32_promoted)),
    ("stat_min", round(mn, 6)),
    ("stat_max", round(mx, 6)),
    ("stat_mean", round(mean, 6)),
    ("stat_std", round(std, 6)),
]

print("SELECT * FROM (VALUES")
print(",\n".join(f"  ('{k}', CAST({v} AS DOUBLE))" for k, v in rows))
print(") AS t(metric, value)")
