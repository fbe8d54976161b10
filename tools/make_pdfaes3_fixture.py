#!/usr/bin/env python3
"""Build fixtures/office/secure/manual256.pdf: a PDF 1.7 document encrypted
with the AESV3 standard security handler (V=5, R=6, AES-256-CBC, empty user
password) per ISO 32000-2 §7.6.4.

This is a THIRD independent implementation of Algorithm 2.B (the Scala spec
carries its own, PdfParser a second): hashlib + the `cryptography` package,
so the committed fixture cross-checks the parser from outside the JVM.
Deterministic output — fixed salts, IVs, and file key — so re-running the
script reproduces the committed bytes exactly.
"""
import hashlib
import os
import zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "office",
                   "secure", "manual256.pdf")


def aes_cbc(key: bytes, iv: bytes, data: bytes, encrypt=True) -> bytes:
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def hash_2b(pwd: bytes, salt: bytes, udata: bytes, r: int = 6) -> bytes:
    k = hashlib.sha256(pwd + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc(k[:16], k[16:32], k1)
        k = {0: hashlib.sha256, 1: hashlib.sha384, 2: hashlib.sha512}[
            sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def enc_obj(fk: bytes, data: bytes, iv: bytes) -> bytes:
    pad = 16 - len(data) % 16
    return iv + aes_cbc(fk, iv, data + bytes([pad]) * pad)


def main():
    fk = bytes((i * 23 + 7) % 256 for i in range(32))

    def salt(seed):
        return bytes((i * 11 + seed) % 256 for i in range(8))

    uvs, uks, ovs, oks = salt(1), salt(2), salt(3), salt(4)
    u = hash_2b(b"", uvs, b"") + uvs + uks
    ue = aes_cbc(hash_2b(b"", uks, b""), bytes(16), fk)
    o = hash_2b(b"", ovs, u) + ovs + oks
    oe = aes_cbc(hash_2b(b"", oks, u), bytes(16), fk)

    pages = [
        "BT (Graft Secure Manual) Tj T* (Keys derive from SHA-256 chains.) Tj ET",
        "BT (Streams carry their own IV.) Tj T* (Padding is PKCS#7.) Tj ET",
    ]
    enc_streams = [
        enc_obj(fk, zlib.compress(p.encode("latin-1")),
                bytes(((i + 3) * 29 + j) % 256 for j in range(16)))
        for i, p in enumerate(pages)
    ]
    enc_title = enc_obj(fk, b"Secure Manual",
                        bytes((j * 31 + 3) % 256 for j in range(16)))
    enc_author = enc_obj(fk, b"Graft Vault",
                         bytes((j * 43 + 5) % 256 for j in range(16)))

    def esc(b: bytes) -> bytes:
        out = bytearray()
        for x in b:
            if x in (0x28, 0x29, 0x5C):
                out += b"\\" + bytes([x])
            elif 0x20 <= x < 0x7F:
                out.append(x)
            else:
                out += ("\\%03o" % x).encode()
        return bytes(out)

    def hx(b: bytes) -> str:
        return b.hex()

    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n",
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" %
        len(enc_streams[0]) + enc_streams[0] + b"\nendstream\nendobj\n",
        b"6 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" %
        len(enc_streams[1]) + enc_streams[1] + b"\nendstream\nendobj\n",
        ("7 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256"
         " /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
         " /StmF /StdCF /StrF /StdCF"
         f" /O <{hx(o)}> /U <{hx(u)}> /OE <{hx(oe)}> /UE <{hx(ue)}>"
         " /P -4 >>\nendobj\n").encode("latin-1"),
        b"8 0 obj\n<< /Title (" + esc(enc_title) + b") /Author (" +
        esc(enc_author) + b") >>\nendobj\n",
    ]
    pdf = b"%PDF-1.7\n" + b"".join(objs) + \
        b"trailer\n<< /Root 1 0 R /Encrypt 7 0 R /Info 8 0 R >>\n%%EOF\n"

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(pdf)
    print(f"wrote {OUT} ({len(pdf)} bytes)")


if __name__ == "__main__":
    main()
