#!/usr/bin/env python3
"""Build fixtures/crawlhtml/pages.warc: WARC response records carrying raw
HTTP responses with HTML bodies — the input shape of the p8 HTML crawl
pipeline (response scan → HTTP split → HTML text extraction → gates).
All-ASCII so the DuckDB oracle re-derives everything from the raw blob.
Kept in its own directory: s18/p7 glob fixtures/crawl/*.warc against a
segment.warc-only oracle, so a second file THERE would desync them.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "crawlhtml")


def warc_record(wtype, headers, payload: bytes) -> bytes:
    h = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
    h += [f"{k}: {v}".encode() for k, v in headers.items()]
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def http(status_line: str, ctype: str, body: str) -> bytes:
    return (f"{status_line}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n{body}").encode()


PAGES = [
    ("https://news.example.com/spark", "HTTP/1.1 200 OK", "text/html; charset=utf-8", """<html><head><title>Engines</title>
<script>track("<a>fake</a>");</script></head>
<body><nav><a href="/">Home</a> <a href="/all">All stories</a></nav>
<h1>Columnar engines &amp; codegen</h1>
<p>The cost of interpretation is amortized by vectorized execution.</p>
<p>Whole-stage codegen fuses the operators of a stage into one loop.</p>
</body></html>"""),
    ("https://blog.example.org/dedup", "HTTP/1.1 200 OK", "text/html", """<html><body>
<p>MinHash banding finds the near duplicates in a corpus without all-pairs work.</p>
<ul><li>shingle</li><li>hash</li><li>band</li></ul>
</body></html>"""),
    ("https://gone.example.net/old", "HTTP/1.1 404 Not Found", "text/html",
     "<html><body><p>Not found.</p></body></html>"),
    ("https://api.example.com/data", "HTTP/1.1 200 OK", "application/json",
     '{"not": "html"}'),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    recs = [warc_record("warcinfo",
                        {"WARC-Date": "2026-08-14T00:00:00Z",
                         "Content-Type": "application/warc-fields"},
                        b"software: graft-crawler/1.0\r\n")]
    for i, (uri, status, ctype, body) in enumerate(PAGES):
        recs.append(warc_record(
            "response",
            {"WARC-Target-URI": uri,
             "WARC-Date": f"2026-08-14T00:00:0{i + 1}Z",
             "Content-Type": "application/http; msgtype=response"},
            http(status, ctype, body)))
    with open(os.path.join(OUT, "pages.warc"), "wb") as f:
        f.write(b"".join(recs))
    print(f"wrote {len(recs)} records to {OUT}/pages.warc")


if __name__ == "__main__":
    main()
