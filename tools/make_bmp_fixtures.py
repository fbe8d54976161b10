#!/usr/bin/env python3
"""Generate fixtures/bitmap/art1.bmp (4x4) and art2.bmp (8x2) — uncompressed
24-bit BMPs with deterministic gradient pixels. BMP stores raw BGR pixel rows
(bottom-up), so the DuckDB oracle for mm2/mm4 can re-derive decoded-pixel
features and area-resized bytes straight from hex(content) — the byte-exact
blob-derived-oracle pattern. Widths are multiples of 4 so rows need no pad.

Deterministic: byte-identical output on every run.
"""
import os
import struct


def bmp(width, height, pixel):  # pixel(x, y) -> (r, g, b), y=0 is TOP row
    row_bytes = width * 3
    assert row_bytes % 4 == 0, "choose widths with no row padding"
    data_size = row_bytes * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      data_size, 2835, 2835, 0, 0)
    rows = []
    for y in reversed(range(height)):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel(x, y)
            row += bytes([b, g, r])  # BGR order
        rows.append(bytes(row))
    return header + dib + b"".join(rows)


def main():
    os.makedirs("fixtures/bitmap", exist_ok=True)
    with open("fixtures/bitmap/art1.bmp", "wb") as f:
        f.write(bmp(4, 4, lambda x, y: (x * 60 + 10, y * 50 + 20, (x + y) * 30)))
    with open("fixtures/bitmap/art2.bmp", "wb") as f:
        f.write(bmp(8, 2, lambda x, y: (x * 30, 255 - x * 25, y * 100 + 5)))
    for n in ("art1", "art2"):
        print(n, os.path.getsize(f"fixtures/bitmap/{n}.bmp"), "bytes")


if __name__ == "__main__":
    main()
