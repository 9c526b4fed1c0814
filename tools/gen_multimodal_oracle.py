#!/usr/bin/env python3
"""Independent oracle for q_multimodal_decode.

The engine builds gradient PNGs (every pixel of row y is the grey value
v = y*255 // (h-1)), encodes them with javax.imageio, decodes them back,
and reports a 4-band mean-luminance profile per image. Because the
gradient is analytic and PNG is lossless, the expected features can be
recomputed here with NO image library: replicate the band assignment
(band = min(3, y*4 // h)), the Rec.601 luma sum (0.299v + 0.587v +
0.114v evaluated left-to-right in IEEE doubles, NOT simplified to v),
the float32 narrowing of the final mean, and the driver's
rint(x*1e6)/1e6 rounding.
"""
import struct

IMAGES = [(0, 40, 30), (1, 64, 48), (2, 17, 11)]
D = 4


def f32(x):
    return struct.unpack('f', struct.pack('f', x))[0]


def rint6(x):
    # math.rint (half-to-even) at 1e6, like the Scala driver side
    y = x * 1e6
    f = int(y // 1)
    frac = y - f
    if frac > 0.5:
        f += 1
    elif frac == 0.5:
        if f % 2 != 0:
            f += 1
    return f / 1e6


rows = []
for mid, w, h in IMAGES:
    sums = [0.0] * D
    counts = [0] * D
    for y in range(h):
        band = min(D - 1, y * D // h)
        v = (y * 255) // (h - 1)
        lum = 0.299 * v + 0.587 * v + 0.114 * v
        for _ in range(w):
            sums[band] += lum
            counts[band] += 1
    for b in range(D):
        val = f32(sums[b] / counts[b] / 255.0)
        rows.append((mid, b, rint6(val)))

print("SELECT * FROM (VALUES")
body = ",\n".join(
    "  ({}, {}, CAST({} AS DOUBLE))".format(m, b, repr(v)) for m, b, v in rows)
print(body)
print(") AS t(media_id, band, value)")
