#!/usr/bin/env python3
"""Build fixtures/crawl/: a plain .warc segment and a plain ustar .tar —
both all-ASCII so the DuckDB oracles re-derive every record/entry from the
raw blob (the .gz variants are exercised in-memory by the Scala spec).
"""
import io
import os
import tarfile

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "crawl")


def warc_record(wtype, headers, payload: bytes) -> bytes:
    h = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
    h += [f"{k}: {v}".encode() for k, v in headers.items()]
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    recs = [
        warc_record("warcinfo",
                    {"WARC-Date": "2026-08-14T00:00:00Z",
                     "Content-Type": "application/warc-fields"},
                    b"software: graft-crawler/1.0\r\nformat: WARC File Format 1.0\r\n"),
        warc_record("conversion",
                    {"WARC-Target-URI": "https://example.com/a",
                     "WARC-Date": "2026-08-14T00:00:01Z",
                     "Content-Type": "text/plain"},
                    b"Spark engines scale by partitioning work.\nShuffles cost the most.\n"),
        warc_record("conversion",
                    {"WARC-Target-URI": "https://example.org/b",
                     "WARC-Date": "2026-08-14T00:00:02Z",
                     "Content-Type": "text/plain"},
                    b"Deduplication keeps corpora honest.\n"),
        warc_record("response",
                    {"WARC-Target-URI": "https://example.net/c",
                     "WARC-Date": "2026-08-14T00:00:03Z",
                     "Content-Type": "application/http; msgtype=response"},
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"),
    ]
    with open(os.path.join(OUT, "segment.warc"), "wb") as f:
        f.write(b"".join(recs))

    tar_path = os.path.join(OUT, "docs.tar")
    files = {
        "corpus/one.txt": b"first document body\n",
        "corpus/two.txt": b"second, a little longer document body text\n",
        "notes.md": b"# heading\nbullet line\n",
    }
    with tarfile.open(tar_path, "w", format=tarfile.USTAR_FORMAT) as t:
        d = tarfile.TarInfo("corpus")
        d.type = tarfile.DIRTYPE
        t.addfile(d)
        for name, body in files.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            t.addfile(ti, io.BytesIO(body))
    for n in ("segment.warc", "docs.tar"):
        print(n, os.path.getsize(os.path.join(OUT, n)), "bytes")


if __name__ == "__main__":
    main()
