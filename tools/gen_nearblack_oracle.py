#!/usr/bin/env python3
"""Independent nearblack oracle for q_nearblack.

Python port of the reference collar-removal algorithm
(gdal/apps/nearblack_lib.cpp): top-down pass (vertical saturating counts,
L-to-R then R-to-L horizontal runs per line), then a bottom-up pass over the
first pass's output with counts reset and the horizontal tolerance pinned
to 0. Ported directly from the C source, kept deliberately line-structured
so divergence from the Scala engine is meaningful.

Prints the pinned SQL VALUES block for SparkEntry.oracleSql.
"""

W, H = 24, 16
DIST, MAXNB = 15, 2
SPECKLES = {(1, 1), (2, 1), (22, 14), (1, 8), (2, 8), (3, 8)}
HOLES = {(10, 8), (11, 8)}


def src(x, y):
    if 4 <= x < 20 and 3 <= y < 13:
        base = 60 + ((x * 7 + y * 11) % 40)
    else:
        base = (x * 5 + y * 3) % 12
    if (x, y) in SPECKLES:
        base = 200
    if (x, y) in HOLES:
        base = 3
    return base


def is_non_black(line, i):
    # single band, single color (black)
    pix = line[i]
    return (0 - pix > DIST) or (pix > DIST + 0)


def process_line(line, counts, i_start, i_end, do_vertical, bottom_up):
    max_nb = MAXNB
    if do_vertical:
        for i in range(W):
            if counts[i] > max_nb:
                continue
            non = is_non_black(line, i)
            if non:
                counts[i] += 1
                if counts[i] > max_nb:
                    continue
            line[i] = 0
    if bottom_up:
        max_nb = 0
    n_non_black = 0
    do_test = True
    direction = 1 if i_start < i_end else -1
    i = i_start
    while i != i_end:
        if do_test:
            non = is_non_black(line, i)
            if non:
                if counts[i] <= max_nb:
                    n_non_black = counts[i]
                else:
                    n_non_black += 1
            if n_non_black > max_nb:
                do_test = False
                i += direction
                continue
            line[i] = 0
        elif counts[i] == 0:
            do_test = True
            n_non_black = 0
        i += direction


def run():
    img = [[src(x, y) for x in range(W)] for y in range(H)]
    # top-down
    counts = [0] * W
    for y in range(H):
        process_line(img[y], counts, 0, W - 1, True, False)
        process_line(img[y], counts, W - 1, 0, False, False)
    # bottom-up
    counts = [0] * W
    for y in range(H - 1, -1, -1):
        process_line(img[y], counts, 0, W - 1, True, True)
        process_line(img[y], counts, W - 1, 0, False, True)
    return img


if __name__ == "__main__":
    img = run()
    rows = []
    for y in range(H):
        for x in range(W):
            rows.append(f"({x}, {y}, {img[y][x]})")
    changed = sum(1 for y in range(H) for x in range(W) if img[y][x] != src(x, y))
    print(f"-- {W}x{H}, {changed} pixels smashed")
    for i in range(0, len(rows), 8):
        print("  " + ", ".join(rows[i:i + 8]) + ("," if i + 8 < len(rows) else ""))
