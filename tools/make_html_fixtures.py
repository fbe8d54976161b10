#!/usr/bin/env python3
"""Build fixtures/html/: small all-ASCII pages exercising every branch of
TextOps.htmlText / htmlLinkDensityBp — script/style/comment removal,
block-tag newlines, entity decode order, uppercase tags, link-heavy
boilerplate. Deterministic content so the DuckDB oracle re-derives the
same text from the raw files.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "html")

PAGES = {
    "article.html": """<!DOCTYPE html>
<html><head><title>Spark at scale</title>
<script type="text/javascript">var x = "<a href='trap'>not a link</a>";</script>
<style>.nav a { color: red; }</style>
</head>
<body>
<!-- navigation block -->
<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/blog">Blog</a></nav>
<h1>Partitioning &amp; shuffles</h1>
<p>Wide transformations shuffle data between executors.</p>
<p>Narrow ones &lt;map, filter&gt; stay pipelined &#39;in place&#39;.</p>
<div>Broadcast joins skip the shuffle for small&nbsp;tables.</div>
<footer><a href="/about">About</a></footer>
</body></html>
""",
    "linkfarm.html": """<html><body>
<UL>
<LI><A HREF="/p1">First partner site</A></LI>
<LI><A HREF="/p2">Second partner site</A></LI>
<LI><A HREF="/p3">Third partner site</A></LI>
</UL>
<p>tiny header</p>
</body></html>
""",
    "fragment.html": """<h2>Release notes</h2>
<table><tr><td>version</td><td>1.2</td></tr>
<tr><td>date</td><td>2026-08-14</td></tr></table>
<blockquote>Quoted &quot;verbatim&quot; text.</blockquote>
No wrapper tags around this trailing line.
""",
    "noisy.html": """<html><head>
<script>
function f() { return 1 < 2 && 3 > 2; }
</script>
<style>
body { margin: 0; }
/* <p>styled paragraph trap</p> */
</style>
</head><body>
<!-- comment
spanning lines -->
<p>Only this paragraph survives.</p>
</body></html>
""",
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, content in PAGES.items():
        with open(os.path.join(OUT, name), "w") as f:
            f.write(content)
    print(f"wrote {len(PAGES)} pages to {OUT}")


if __name__ == "__main__":
    main()
