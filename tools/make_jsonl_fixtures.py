#!/usr/bin/env python3
"""Build fixtures/jsonl/: newline-delimited JSON corpus shards — the
standard LLM training-corpus interchange format — one plain shard and one
gzip shard (both engines decompress by extension). Nested object + array
fields exercise the schema mapping; all-ASCII, deterministic.
"""
import gzip
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "jsonl")

DOCS = [
    {"id": 1, "text": "Columnar scans prune unread columns.",
     "meta": {"lang": "en", "source": "web"}, "tags": ["spark", "io"], "tokens": 5},
    {"id": 2, "text": "Shuffles materialize map outputs.",
     "meta": {"lang": "en", "source": "web"}, "tags": ["shuffle"], "tokens": 4},
    {"id": 3, "text": "La memoire se partage mal.",
     "meta": {"lang": "fr", "source": "books"}, "tags": [], "tokens": 5},
    {"id": 4, "text": "Broadcast joins copy the small side.",
     "meta": {"lang": "en", "source": "books"}, "tags": ["join", "broadcast"], "tokens": 6},
]

GZ_DOCS = [
    {"id": 5, "text": "Compressed shards stream through the same reader.",
     "meta": {"lang": "en", "source": "crawl"}, "tags": ["gzip"], "tokens": 7},
    {"id": 6, "text": "Ein Satz im zweiten Shard.",
     "meta": {"lang": "de", "source": "crawl"}, "tags": ["gzip", "de"], "tokens": 5},
]


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "shard0.jsonl"), "w") as f:
        for d in DOCS:
            f.write(json.dumps(d, sort_keys=True) + "\n")
    body = "".join(json.dumps(d, sort_keys=True) + "\n" for d in GZ_DOCS)
    with open(os.path.join(OUT, "shard1.jsonl.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(body.encode())
    print(f"wrote {len(DOCS)}+{len(GZ_DOCS)} docs to {OUT}")


if __name__ == "__main__":
    main()
