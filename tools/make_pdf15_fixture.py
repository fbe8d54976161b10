#!/usr/bin/env python3
"""Generate fixtures/office/manual15.pdf — a PDF 1.5 document whose catalog,
page tree and /Info dict live ONLY inside a /ObjStm object stream, with a
/Type/XRef cross-reference stream as the only xref (no classic table): the
layout modern PDF writers emit.

Both structural streams use /Filter /ASCIIHexDecode so the file stays pure
ASCII and the DuckDB oracle can independently re-derive text, page count and
metadata from the raw blob (decode(unhex(...)) of the hex body) — the same
blob-derived-oracle pattern as the STORED-zip OOXML fixtures. The
FlateDecode + predictor variants of the same machinery are unit-tested in
BinaryExtractorsSpec (buildPdf15).

Deterministic: byte-identical output on every run.
"""
import textwrap

MEMBERS = [
    (1, "<< /Type /Catalog /Pages 2 0 R >>"),
    (2, "<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>"),
    (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    (6, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    (7, "<< /Title (Modern Manual) /Author (Graft Team) >>"),
]
CS1 = "BT (Object streams hold the page tree) Tj ET"
CS2 = "BT (Xref streams replace the table) Tj ET"


def hex_body(raw: bytes) -> str:
    return "\n".join(textwrap.wrap(raw.hex(), 64)) + ">"


def main():
    offs, pos = [], 0
    for _, body in MEMBERS:
        offs.append(pos)
        pos += len(body) + 1
    header = " ".join(f"{n} {o}" for (n, _), o in zip(MEMBERS, offs)) + "\n"
    payload = " ".join(b for _, b in MEMBERS)
    objstm_raw = (header + payload).encode("latin1")
    objstm_hex = hex_body(objstm_raw)

    out = []
    size = 0

    def add(s: str) -> int:
        nonlocal size
        off = size
        out.append(s)
        size += len(s)
        return off

    add("%PDF-1.5\n")
    off4 = add(f"4 0 obj\n<< /Length {len(CS1)} >>\nstream\n{CS1}\nendstream\nendobj\n")
    off5 = add(f"5 0 obj\n<< /Length {len(CS2)} >>\nstream\n{CS2}\nendstream\nendobj\n")
    off8 = add(
        f"8 0 obj\n<< /Type /ObjStm /N {len(MEMBERS)} /First {len(header)}"
        f" /Filter /ASCIIHexDecode /Length {len(objstm_hex)} >>\nstream\n"
        f"{objstm_hex}\nendstream\nendobj\n")
    off9 = size
    rows = [
        (0, 0, 0xFFFF),  # 0: free
        (2, 8, 0),       # 1..3: in ObjStm 8
        (2, 8, 1),
        (2, 8, 2),
        (1, off4, 0),
        (1, off5, 0),
        (2, 8, 3),       # 6, 7: in ObjStm 8
        (2, 8, 4),
        (1, off8, 0),
        (1, off9, 0),
    ]
    packed = b"".join(
        bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3 & 0xFF]) for t, f2, f3 in rows)
    xr_hex = hex_body(packed)
    add(
        f"9 0 obj\n<< /Type /XRef /Size 10 /W [1 2 1] /Index [0 10]"
        f" /Root 1 0 R /Info 7 0 R /Filter /ASCIIHexDecode"
        f" /Length {len(xr_hex)} >>\nstream\n{xr_hex}\nendstream\nendobj\n")
    add(f"startxref\n{off9}\n%%EOF\n")

    with open("fixtures/office/manual15.pdf", "wb") as f:
        f.write("".join(out).encode("latin1"))
    print(f"wrote fixtures/office/manual15.pdf ({size} bytes, xref stream at {off9})")


if __name__ == "__main__":
    main()
