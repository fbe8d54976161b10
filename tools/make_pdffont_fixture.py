#!/usr/bin/env python3
"""Generate fixtures/office/fontprog/fontprog.pdf — a 3-page PDF whose text
is recoverable ONLY by reading the embedded font programs: every font dict
has NO /ToUnicode, NO /Encoding (neither a base-encoding name nor a
/Differences dict), and the show strings use SCRAMBLED character codes, so
an extractor that falls back to literal bytes reads gibberish. This is the
situation where pypdf (the reference's extractor) consults the embedded
font file itself; the Spark side resolves it via graft.sources.FontPrograms.

  page 1 — Type1 (/FontFile): the /Encoding vector sits in the cleartext
           PostScript before eexec as `dup <code> /<name> put` entries.
  page 2 — TrueType (/FontFile2, /Filter /ASCIIHexDecode): code -> glyph
           through a (1,0) cmap format 6 subtable, glyph -> name through
           post format 2.0 standard-Macintosh indices, name -> text via AGL.
  page 3 — CFF/Type1C (/FontFile3, ASCIIHex): code -> glyph through an
           Encoding (format 0), glyph -> SID through a charset (format 0),
           SID -> standard-strings name -> text via AGL.

Everything stays pure ASCII (binary font programs ride behind
ASCIIHexDecode), so the DuckDB oracle can independently REPLAY all three
decodes from the raw blob: page 1 from the regex-visible dup/put pairs,
page 2 by parsing the post glyphNameIndex out of the hex stream (anchored
on the post-table magic), page 3 by parsing the Encoding/charset byte
arrays at their deterministic CFF offsets. No pinned text anywhere.

Deterministic: byte-identical output on every run.
"""
import os
import struct
import textwrap

L1 = "graft reads the font program"
L2 = "type one encoding vector"
P2 = "stone age cmap tables"
P3 = "compact font format"


def scramble(text_chars):
    """Distinct chars in first-appearance order -> codes 65, 66, ..."""
    order = []
    for c in text_chars:
        if c not in order:
            order.append(c)
    return {c: 65 + i for i, c in enumerate(order)}, order


def hex_body(raw: bytes) -> str:
    return "\n".join(textwrap.wrap(raw.hex(), 64)) + ">"


def type1_program():
    m, order = scramble(L1 + L2)
    lines = ["%!PS-AdobeFont-1.0: GraftScramble 001.001",
             "/FontName /GRAFTA+Scramble def",
             "/PaintType 0 def",
             "/FontMatrix [0.001 0 0 0.001 0 0] readonly def",
             "/Encoding 256 array",
             "0 1 255 {1 index exch /.notdef put} for"]
    for c in order:
        name = "space" if c == " " else c
        lines.append(f"dup {m[c]} /{name} put")
    lines += ["readonly def", "currentdict end", "eexec",
              "0123456789abcdef0123456789abcdef"]
    enc1 = "".join(chr(m[c]) for c in L1)
    enc2 = "".join(chr(m[c]) for c in L2)
    return "\n".join(lines), enc1, enc2


def truetype_program():
    m, order = scramble(P2)
    n = len(order)                      # glyphs 1..n; codes 65..64+n
    # cmap: version 0, one (1,0) subtable, format 6
    sub = struct.pack(">HHHHH", 6, 10 + 2 * n, 0, 65, n)
    sub += b"".join(struct.pack(">H", g) for g in range(1, n + 1))
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 1, 0, 12) + sub
    # post 2.0: 32-byte header, numGlyphs, standard-Mac indices
    # (index for ASCII char ch is ord(ch) - 29; glyph 0 is .notdef)
    post = struct.pack(">IiHHIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
    post += struct.pack(">H", n + 1) + struct.pack(">H", 0)
    post += b"".join(struct.pack(">H", ord(c) - 29) for c in order)
    tables = [(b"cmap", cmap), (b"post", post)]
    off = 12 + 16 * len(tables)
    sfnt = struct.pack(">IHHHH", 0x00010000, len(tables), 32, 1, 0)
    body = b""
    for tag, data in tables:
        sfnt += tag + struct.pack(">III", 0, off + len(body), len(data))
        body += data
    enc = "".join(chr(m[c]) for c in P2)
    return sfnt + body, enc


def cff_program():
    m, order = scramble(P3)
    n = len(order)                      # glyphs 1..n; codes 65..64+n
    name_idx = bytes([0, 1, 1, 1, 6]) + b"Graft"                 # bytes 4..13
    # Top DICT with fixed-width (29 = 5-byte) operands: CharStrings (17),
    # charset (15), Encoding (16). Offsets computed below are absolute.
    enc_off = 39
    cs_off = enc_off + 2 + n            # Encoding fmt 0: fmt, nCodes, codes
    chstr_off = cs_off + 1 + 2 * n      # charset fmt 0:  fmt, (n) u16 SIDs
    dict_body = (b"\x1d" + struct.pack(">I", chstr_off) + b"\x11"
                 + b"\x1d" + struct.pack(">I", cs_off) + b"\x0f"
                 + b"\x1d" + struct.pack(">I", enc_off) + b"\x10")
    top_idx = bytes([0, 1, 1, 1, 1 + len(dict_body)]) + dict_body
    string_idx = bytes([0, 0])
    encoding = bytes([0, n]) + bytes(m[c] for c in order)
    # standard-strings SID for ASCII char ch is ord(ch) - 31
    charset = bytes([0]) + b"".join(struct.pack(">H", ord(c) - 31) for c in order)
    charstrings = (struct.pack(">H", n + 1) + bytes([1])
                   + bytes(range(1, n + 3)) + b"\x0e" * (n + 1))
    cff = bytes([1, 0, 4, 2]) + name_idx + top_idx + string_idx
    assert len(cff) == enc_off, (len(cff), enc_off)
    cff += encoding + charset
    assert len(cff) == chstr_off, (len(cff), chstr_off)
    cff += charstrings
    enc = "".join(chr(m[c]) for c in P3)
    return cff, enc


def main():
    t1, e1a, e1b = type1_program()
    tt, e2 = truetype_program()
    cf, e3 = cff_program()
    cs1 = f"BT /F1 12 Tf 72 700 Td ({e1a}) Tj 0 -20 Td ({e1b}) Tj ET"
    cs2 = f"BT /F2 12 Tf 72 700 Td ({e2}) Tj ET"
    cs3 = f"BT /F3 12 Tf 72 700 Td ({e3}) Tj ET"
    tt_hex, cf_hex = hex_body(tt), hex_body(cf)

    objs = {
        1: "<< /Type /Catalog /Pages 2 0 R >>",
        2: "<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 >>",
        3: "<< /Type /Page /Parent 2 0 R /Contents 6 0 R"
           " /Resources << /Font << /F1 9 0 R >> >> >>",
        4: "<< /Type /Page /Parent 2 0 R /Contents 7 0 R"
           " /Resources << /Font << /F2 12 0 R >> >> >>",
        5: "<< /Type /Page /Parent 2 0 R /Contents 8 0 R"
           " /Resources << /Font << /F3 15 0 R >> >> >>",
        6: f"<< /Length {len(cs1)} >>\nstream\n{cs1}\nendstream",
        7: f"<< /Length {len(cs2)} >>\nstream\n{cs2}\nendstream",
        8: f"<< /Length {len(cs3)} >>\nstream\n{cs3}\nendstream",
        9: "<< /Type /Font /Subtype /Type1 /BaseFont /GRAFTA+Scramble"
           " /FontDescriptor 10 0 R >>",
        10: "<< /Type /FontDescriptor /FontName /GRAFTA+Scramble /Flags 4"
            " /FontFile 11 0 R >>",
        11: f"<< /Length {len(t1)} >>\nstream\n{t1}\nendstream",
        12: "<< /Type /Font /Subtype /TrueType /BaseFont /GRAFTB+Scramble"
            " /FontDescriptor 13 0 R >>",
        13: "<< /Type /FontDescriptor /FontName /GRAFTB+Scramble /Flags 4"
            " /FontFile2 14 0 R >>",
        14: f"<< /Filter /ASCIIHexDecode /Length {len(tt_hex)} >>"
            f"\nstream\n{tt_hex}\nendstream",
        15: "<< /Type /Font /Subtype /Type1 /BaseFont /GRAFTC+Compact"
            " /FontDescriptor 16 0 R >>",
        16: "<< /Type /FontDescriptor /FontName /GRAFTC+Compact /Flags 4"
            " /FontFile3 17 0 R >>",
        17: f"<< /Subtype /Type1C /Filter /ASCIIHexDecode /Length {len(cf_hex)} >>"
            f"\nstream\n{cf_hex}\nendstream",
        18: "<< /Title (Font Program Manual) /Author (Graft Type Dept) >>",
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
    trailer = (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Info 18 0 R >>"
               f"\nstartxref\n{xref_off}\n%%EOF\n")
    out.append("\n".join(xref) + "\n" + trailer)

    os.makedirs("fixtures/office/fontprog", exist_ok=True)
    path = "fixtures/office/fontprog/fontprog.pdf"
    with open(path, "wb") as f:
        f.write("".join(out).encode("latin1"))
    print(f"wrote {path} ({sum(len(s) for s in out)} bytes)")
    print(f"  page1 show strings: ({e1a}) ({e1b})")
    print(f"  page2 show string:  ({e2})")
    print(f"  page3 show string:  ({e3})")


if __name__ == "__main__":
    main()
