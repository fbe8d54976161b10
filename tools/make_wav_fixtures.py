#!/usr/bin/env python3
"""Build fixtures/audio/*.wav: small deterministic 16-bit PCM WAVs for
the mm7 oracle (real RIFF/PCM parsing — no codec needed).

  tone.wav   : mono 8 kHz, 160 samples of an integer sine-table tone
  stereo.wav : 2ch 16 kHz, 96 frames — L = square wave, R = ramp — with a
               LIST chunk BEFORE data (proves the chunk walker skips
               unknown chunks instead of assuming data at offset 44)
"""
import math
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "audio")


def wav(path, rate, channels, frames, extra_chunks=b""):
    data = b"".join(struct.pack("<h", s) for fr in frames for s in fr)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + extra_chunks + \
        b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def main():
    os.makedirs(OUT, exist_ok=True)
    tone = [[int(12000 * math.sin(2 * math.pi * i / 20))] for i in range(160)]
    wav(os.path.join(OUT, "tone.wav"), 8000, 1, tone)
    sq = [[(8000 if (i // 8) % 2 == 0 else -8000), (i * 300 - 14000)]
          for i in range(96)]
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOjunk35"  # even-size chunk
    wav(os.path.join(OUT, "stereo.wav"), 16000, 2, sq, extra_chunks=lst)
    for n in ("tone.wav", "stereo.wav"):
        print(n, os.path.getsize(os.path.join(OUT, n)), "bytes")


if __name__ == "__main__":
    main()
