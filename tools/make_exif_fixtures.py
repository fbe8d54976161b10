#!/usr/bin/env python3
"""EXIF fixtures for mm9: hand-assembled JPEG APP1/TIFF bytes (no PIL).

Three files under fixtures/images/exif/:
  exif_ii.jpg  -- little-endian TIFF ('II'), Orientation 6, Make/Model,
                  Exif sub-IFD with DateTimeOriginal
  exif_mm.jpg  -- big-endian TIFF ('MM'), Orientation 1, Make only
  noexif.jpg   -- SOI + a non-APP1 segment, no EXIF -> all-NULL row

All ASCII values are > 4 bytes (offset-addressed) so the SQL oracle only
needs the offset form; the Scala parser's inline (<=4) path is covered by
a unit test instead.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "images", "exif")


def tiff(le, entries0, exif_entries):
    """Build a TIFF blob. entries: list of (tag, typ, count, value_bytes_or_int)."""
    e = "<" if le else ">"
    blobs = []          # (placeholder_index, data) for offset-addressed values

    def build_ifd(entries, ifd_off, data_off, next_off=0):
        """Returns (ifd_bytes, data_bytes). Offsets are TIFF-relative."""
        out = struct.pack(e + "H", len(entries))
        data = b""
        for tag, typ, count, val in entries:
            out += struct.pack(e + "HHI", tag, typ, count)
            if isinstance(val, int):
                if typ == 3:  # SHORT: left-justified in the 4-byte slot
                    out += struct.pack(e + "H", val) + b"\x00\x00"
                else:         # LONG
                    out += struct.pack(e + "I", val)
            else:             # bytes payload, offset-addressed
                out += struct.pack(e + "I", data_off + len(data))
                data += val
        out += struct.pack(e + "I", next_off)
        return out, data

    # layout: header(8) | ifd0 | ifd0 data | exif ifd | exif data
    ifd0_off = 8
    ifd0_size = 2 + 12 * len(entries0) + 4
    data0_off = ifd0_off + ifd0_size
    data0_len = sum(len(v) for _, _, _, v in entries0 if not isinstance(v, int))
    exif_off = data0_off + data0_len
    # resolve the Exif-pointer placeholder now that exif_off is known
    resolved0 = [(t, ty, c, exif_off if (t == 0x8769 and isinstance(v, int)) else v)
                 for (t, ty, c, v) in entries0]
    ifd0, data0 = build_ifd(resolved0, ifd0_off, data0_off)
    header = (b"II" if le else b"MM") + struct.pack(e + "H", 42) + struct.pack(e + "I", ifd0_off)
    if exif_entries:
        exif_size = 2 + 12 * len(exif_entries) + 4
        edata_off = exif_off + exif_size
        eifd, edata = build_ifd(exif_entries, exif_off, edata_off)
        return header + ifd0 + data0 + eifd + edata
    return header + ifd0 + data0


def jpeg_with_app1(tiff_bytes):
    payload = b"Exif\x00\x00" + tiff_bytes
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xff\xd8" + app1 + b"\xff\xd9"


def asciz(s):
    return s.encode("ascii") + b"\x00"


def main():
    os.makedirs(OUT, exist_ok=True)

    ii = tiff(True, [
        (0x010F, 2, len(asciz("GraftCam")), asciz("GraftCam")),    # Make
        (0x0110, 2, len(asciz("X100 Mark II")), asciz("X100 Mark II")),
        (0x0112, 3, 1, 6),                                          # Orientation: rotate 90 CW
        (0x8769, 4, 1, 0),                                          # Exif IFD pointer (resolved)
    ], [
        (0x9003, 2, len(asciz("2025:12:31 23:59:58")), asciz("2025:12:31 23:59:58")),
    ])
    with open(os.path.join(OUT, "exif_ii.jpg"), "wb") as f:
        f.write(jpeg_with_app1(ii))

    mm = tiff(False, [
        (0x010F, 2, len(asciz("Acme Optical")), asciz("Acme Optical")),
        (0x0112, 3, 1, 1),
    ], [])
    with open(os.path.join(OUT, "exif_mm.jpg"), "wb") as f:
        f.write(jpeg_with_app1(mm))

    # SOI + APP0(JFIF stub) + EOI: a JPEG with no EXIF at all
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    with open(os.path.join(OUT, "noexif.jpg"), "wb") as f:
        f.write(b"\xff\xd8" + app0 + b"\xff\xd9")

    for n in sorted(os.listdir(OUT)):
        print(n, os.path.getsize(os.path.join(OUT, n)))


if __name__ == "__main__":
    main()
