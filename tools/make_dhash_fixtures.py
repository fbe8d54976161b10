#!/usr/bin/env python3
"""Build fixtures/bitmap/dhash/*.bmp: six 16x16 grayscale 24-bit BMPs with
PLANNED perceptual-hash relationships for the mm6 oracle:

  art_a / art_a2 : near-duplicates (dHash Hamming distance 1..3)
  art_b / art_b2 : near-duplicates (dHash Hamming distance 1..3)
  art_c, art_d   : far from everything else (distance > 10)

dHash here replays graft's Multimodal.dHash exactly: pixel-center NEAREST
sample to a 9x8 gray grid (gray = (r+g+b)//3), bit (y*8+x) set iff
g[y][x] > g[y][x+1]. The generator asserts every planned distance, so a
drifting implementation fails loudly at build time, not in the oracle.
Deterministic output.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "bitmap", "dhash")
W = H = 16
XS = [(ox * W + W // 2) // 9 for ox in range(9)]   # nearest sample columns
YS = [(oy * H + H // 2) // 8 for oy in range(8)]   # nearest sample rows


def dhash(grid):
    bits = 0
    for y in range(8):
        for x in range(8):
            if grid[y][x] > grid[y][x + 1]:
                bits |= 1 << (y * 8 + x)
    return bits


def dist(a, b):
    return bin(a ^ b).count("1")


def grid_from(f):
    return [[f(x, y) for x in range(9)] for y in range(8)]


def image_from_grid(grid):
    """16x16 gray image whose 9x8 nearest-sample IS the grid."""
    def ox_of(x):
        return min(range(9), key=lambda i: (abs(XS[i] - x), i))

    def oy_of(y):
        return min(range(8), key=lambda i: (abs(YS[i] - y), i))

    return [[grid[oy_of(y)][ox_of(x)] for x in range(W)] for y in range(H)]


def write_bmp(path, img):
    row_bytes = W * 3  # 48, already 4-byte aligned
    size = 54 + row_bytes * H
    with open(path, "wb") as f:
        f.write(b"BM" + struct.pack("<IHHI", size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0,
                            row_bytes * H, 2835, 2835, 0, 0))
        for y in range(H - 1, -1, -1):  # bottom-up rows
            for x in range(W):
                v = img[y][x]
                f.write(bytes((v, v, v)))  # BGR, gray


def main():
    a = grid_from(lambda x, y: ((x * 37 + y * 59 + 13) * 97) % 256)
    b = grid_from(lambda x, y: ((x * 71 + y * 29 + 5) * 151) % 256)
    c = grid_from(lambda x, y: ((x * 13 + y * 17 + 101) * 211) % 256)
    d = grid_from(lambda x, y: ((x * 23 + y * 83 + 191) * 131) % 256)

    a2 = [row[:] for row in a]
    a2[3][4] = 255 if a[3][4] < 128 else 0  # flips comparisons (3,3) and (3,4)
    b2 = [row[:] for row in b]
    b2[6][2] = 255 if b[6][2] < 128 else 0

    named = {"art_a": a, "art_a2": a2, "art_b": b, "art_b2": b2,
             "art_c": c, "art_d": d}
    hashes = {k: dhash(g) for k, g in named.items()}
    # planned relationships — fail HERE if any drift
    assert 1 <= dist(hashes["art_a"], hashes["art_a2"]) <= 3, hashes
    assert 1 <= dist(hashes["art_b"], hashes["art_b2"]) <= 3, hashes
    far_pairs = [("art_a", "art_b"), ("art_a", "art_c"), ("art_a", "art_d"),
                 ("art_b", "art_c"), ("art_b", "art_d"), ("art_c", "art_d"),
                 ("art_a2", "art_b2"), ("art_a2", "art_c"), ("art_b2", "art_d")]
    for p, q in far_pairs:
        assert dist(hashes[p], hashes[q]) > 10, (p, q, dist(hashes[p], hashes[q]))

    os.makedirs(OUT, exist_ok=True)
    for name, grid in named.items():
        write_bmp(os.path.join(OUT, f"{name}.bmp"), image_from_grid(grid))
    for name in sorted(named):
        print(f"{name}: dhash={hashes[name]:016x}")
    print(f"wrote {len(named)} bmps to {OUT}")


if __name__ == "__main__":
    main()
