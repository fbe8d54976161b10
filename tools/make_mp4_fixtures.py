#!/usr/bin/env python3
"""Build fixtures/video/*.mp4: minimal valid ISO-BMFF (MP4) containers for
the mm8 oracle — real box (atom) structure, no codec payload needed.

  clip.mp4 : movie timescale 1000, duration 2500 ms; a 'vide' track
             (320x180, track duration 2500) and a 'soun' track
  tiny.mp4 : timescale 600, duration 1200 units (2000 ms); one 'vide'
             track (64x48) — and a free box before moov so fixed-offset
             parsing fails
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "video")


def box(tag, payload):
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def mvhd(timescale, duration):
    p = struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, timescale, duration)
    p += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100) + b"\x00" * 10
    p += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p += b"\x00" * 24 + struct.pack(">I", 3)
    return box(b"mvhd", p)


def tkhd(track_id, duration, w, h):
    p = struct.pack(">B3x", 0) + struct.pack(">III4xI8x", 0, 0, track_id, duration)
    p += struct.pack(">hhhh", 0, 0, 0, 0)
    p += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p += struct.pack(">II", w << 16, h << 16)
    return box(b"tkhd", p)


def mdhd(timescale, duration):
    p = struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, timescale, duration)
    p += struct.pack(">HH", 0x55C4, 0)  # language 'und', predefined
    return box(b"mdhd", p)


def hdlr(handler):
    return box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + handler +
               b"\x00" * 12 + b"graft\x00")


def trak(track_id, duration, w, h, handler, mtimescale):
    mdia = box(b"mdia", mdhd(mtimescale, duration) + hdlr(handler))
    return box(b"trak", tkhd(track_id, duration, w, h) + mdia)


def main():
    os.makedirs(OUT, exist_ok=True)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")

    moov = box(b"moov", mvhd(1000, 2500) +
               trak(1, 2500, 320, 180, b"vide", 12800) +
               trak(2, 2500, 0, 0, b"soun", 44100))
    mdat = box(b"mdat", bytes(range(64)))
    with open(os.path.join(OUT, "clip.mp4"), "wb") as f:
        f.write(ftyp + moov + mdat)

    free = box(b"free", b"padding-bytes-here")
    moov2 = box(b"moov", mvhd(600, 1200) + trak(1, 1200, 64, 48, b"vide", 600))
    with open(os.path.join(OUT, "tiny.mp4"), "wb") as f:
        f.write(ftyp + free + moov2 + box(b"mdat", bytes(32)))

    for n in ("clip.mp4", "tiny.mp4"):
        print(n, os.path.getsize(os.path.join(OUT, n)), "bytes")


if __name__ == "__main__":
    main()
