#!/usr/bin/env python3
"""Generate fixtures/office/fontnonagl/fontnonagl.pdf — a 1-page PDF whose
embedded Type1 font maps SCRAMBLED character codes exclusively to glyph
names OUTSIDE the plain name table: suffixed names (`h.sc`, `o.sc.alt`,
`e.alt1`), underscore ligatures (`f_i`), multi-group `uniXXXXYYYY` names
(`uni00650073` -> "es", `uni004A0056004D` -> "JVM"), `uXXXX`/`uXXXXX`
forms (`u0067` -> "g", `u1D11E` -> U+1D11E), plus one deliberately
unresolvable subset name (`g42`) that must fall back to the literal code
byte. No /ToUnicode, no /Differences, no base encoding: text is
recoverable only by running the Adobe Glyph List ALGORITHM (suffix strip
at the first period, underscore split, uni/u hex parsing) over the font
program's own /Encoding vector — the pypdf resolution the reference
inherits (backend/extractors/pdf_extractor.py:16-40).

The font program stays cleartext ASCII, so the DuckDB oracle replays the
decode end to end from the raw PDF bytes with the same algorithm in SQL.

Deterministic: byte-identical output on every run.
"""
import os

# (glyph name, decoded text) per TOKEN; the show strings reference tokens,
# and distinct names take codes 65, 66, ... in first-use order.
LINE1 = [
    ("T", "T"), ("h.sc", "h"), ("e.alt1", "e"), ("space", " "),
    ("f_i", "fi"), ("x", "x"), ("space", " "),
    ("t", "t"), ("uni00650073", "es"), ("t", "t"), ("space", " "),
    ("u0067", "g"), ("o.sc.alt", "o"), ("o.sc.alt", "o"), ("d", "d"),
]
LINE2 = [
    ("uni004A0056004D", "JVM"), ("space", " "),
    ("c", "c"), ("l", "l"), ("e.alt1", "e"), ("f", "f"), ("space", " "),
    ("u1D11E", "\U0001D11E"), ("space", " "), ("g42", None),  # literal byte
]


def main():
    codes, order = {}, []
    for name, _ in LINE1 + LINE2:
        if name not in codes:
            codes[name] = 65 + len(order)
            order.append(name)

    lines = ["%!PS-AdobeFont-1.0: GraftNonAgl 001.001",
             "/FontName /GRAFTN+NonAgl def",
             "/PaintType 0 def",
             "/FontMatrix [0.001 0 0 0.001 0 0] readonly def",
             "/Encoding 256 array",
             "0 1 255 {1 index exch /.notdef put} for"]
    for name in order:
        lines.append(f"dup {codes[name]} /{name} put")
    lines += ["readonly def", "currentdict end", "eexec",
              "0123456789abcdef0123456789abcdef"]
    t1 = "\n".join(lines)

    enc1 = "".join(chr(codes[n]) for n, _ in LINE1)
    enc2 = "".join(chr(codes[n]) for n, _ in LINE2)
    cs = f"BT /F1 12 Tf 72 700 Td ({enc1}) Tj 0 -20 Td ({enc2}) Tj ET"

    objs = {
        1: "<< /Type /Catalog /Pages 2 0 R >>",
        2: "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: "<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
           " /Resources << /Font << /F1 5 0 R >> >> >>",
        4: f"<< /Length {len(cs)} >>\nstream\n{cs}\nendstream",
        5: "<< /Type /Font /Subtype /Type1 /BaseFont /GRAFTN+NonAgl"
           " /FontDescriptor 6 0 R >>",
        6: "<< /Type /FontDescriptor /FontName /GRAFTN+NonAgl /Flags 4"
           " /FontFile 7 0 R >>",
        7: f"<< /Length {len(t1)} >>\nstream\n{t1}\nendstream",
        8: "<< /Title (NonAGL Glyph Names) /Author (Graft Type Dept) >>",
    }

    out, offsets = ["%PDF-1.4\n"], {}
    size = len(out[0])
    for num in sorted(objs):
        offsets[num] = size
        s = f"{num} 0 obj\n{objs[num]}\nendobj\n"
        out.append(s)
        size += len(s)
    xref_off = size
    xref = ["xref", f"0 {len(objs) + 1}", "0000000000 65535 f "]
    xref += [f"{offsets[n]:010d} 00000 n " for n in sorted(objs)]
    trailer = (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Info 8 0 R >>"
               f"\nstartxref\n{xref_off}\n%%EOF\n")
    out.append("\n".join(xref) + "\n" + trailer)

    os.makedirs("fixtures/office/fontnonagl", exist_ok=True)
    path = "fixtures/office/fontnonagl/fontnonagl.pdf"
    with open(path, "wb") as f:
        f.write("".join(out).encode("latin1"))
    want1 = "".join(t for _, t in LINE1)
    want2 = "".join(t if t is not None else chr(codes[n]) for n, t in LINE2)
    print(f"wrote {path} ({sum(len(s) for s in out)} bytes)")
    print(f"  expected line 1: {want1!r}")
    print(f"  expected line 2: {want2!r}")


if __name__ == "__main__":
    main()
