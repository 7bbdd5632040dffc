"""Deterministic synthetic Common-Crawl-style web (FIXTURES.md §1).

Every page is a pure function of its URL and a ``WebSpec`` — no RNG state, no
wall clock, no network. That means:

* the full corpus for any scale is enumerable (``iter_pages``) without
  materializing anything up front — a 10^10-URL frontier can be synthesized
  shard-by-shard on executors because ``page_html(url)`` needs only the url;
* the golden ``text`` column is produced by the SAME kernel extraction the
  engine runs, so byte-parity tests are self-consistent.

Graph shape (per host ``site{k}.example``):
  root ``/``            → sections ``/sec{i}`` (+ ``/about``)        depth 1
  section               → pages ``/sec{i}/page{j}.html``             depth 2
  page                  → sibling pages, ``?v=1`` variant, ``extra``  depth 3
  ``…/page{j}/extra``   → ``…/extra/more`` (j%6==0)                   depth 4
plus: duplicate links, fragments, trailing slashes, relative hrefs, external
hosts, and dangling links (fetch-failure path) — exercising URL
canonicalization (crawler.py:150-165), first-appender dedup (crawler.py:223)
and same-domain gating (crawler.py:219-221).

Host-size skew: host 0 is "hot" (gets the max fanout) so partition salting and
AQE skew handling have something real to chew on.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Iterator, Optional, Tuple
from urllib.parse import urlparse

from crawl4ai_scraper_spark.kernel.extraction import extract_text

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "signal lattice beacon crawler frontier parquet shuffle catalyst arrow "
    "vector salted bucket snapshot lineage politeness robots priority queue "
    "document corpus token shingle minhash cosine embedding window partition "
    "broadcast executor spillover watermark manifest checkpoint replay"
).split()

_LANGS = ("en", "en", "en", "en", "en", "en", "en", "en", "en", "en",
          "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")


def _h(*parts) -> int:
    """Stable 64-bit hash of the joined parts (seeded by spec elsewhere)."""
    blob = "␟".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(blob).digest()[:8], "big")


@dataclass(frozen=True)
class WebSpec:
    n_hosts: int = 4
    max_secs: int = 4
    max_pages: int = 8
    seed: int = 42

    def host(self, k: int) -> str:
        return f"site{k}.example"

    def n_secs(self, k: int) -> int:
        if k == 0:  # hot host: max fanout → frontier skew
            return self.max_secs
        return 2 + _h(self.seed, "secs", k) % max(1, self.max_secs - 1)

    def n_pages(self, k: int, i: int) -> int:
        if k == 0:
            return self.max_pages
        return 2 + _h(self.seed, "pages", k, i) % max(1, self.max_pages - 1)


# ---------------------------------------------------------------------------
# URL space
# ---------------------------------------------------------------------------

def _parse_site(spec: WebSpec, url: str) -> Optional[Tuple[int, str, str]]:
    p = urlparse(url)
    if p.scheme != "https" or not p.netloc.endswith(".example"):
        return None
    stem = p.netloc[: -len(".example")]
    if not stem.startswith("site"):
        return None
    try:
        k = int(stem[4:])
    except ValueError:
        return None
    if not (0 <= k < spec.n_hosts):
        return None
    return k, p.path or "/", p.query


def page_exists(spec: WebSpec, url: str) -> bool:
    parsed = _parse_site(spec, url)
    if parsed is None:
        return False
    k, path, query = parsed
    if query not in ("", "v=1"):
        return False
    if path in ("/", "/about"):
        return query == ""
    segs = [s for s in path.strip("/").split("/") if s]
    if not segs[0].startswith("sec"):
        return False
    try:
        i = int(segs[0][3:])
    except ValueError:
        return False
    if i >= spec.n_secs(k):
        return False
    if len(segs) == 1:
        return query == ""
    if len(segs) == 2:  # leaf page: /sec{i}/page{j}.html (optionally ?v=1)
        if not (segs[1].startswith("page") and segs[1].endswith(".html")):
            return False
        try:
            j = int(segs[1][4:-5])
        except ValueError:
            return False
        return j < spec.n_pages(k, i)
    # deep appendix paths use the bare page stem: /sec{i}/page{j}/extra[/more]
    if not segs[1].startswith("page"):
        return False
    try:
        j = int(segs[1][4:])
    except ValueError:
        return False
    if j >= spec.n_pages(k, i):
        return False
    if len(segs) == 3 and segs[2] == "extra" and query == "":
        return j % 3 == 0
    if len(segs) == 4 and segs[2] == "extra" and segs[3] == "more" and query == "":
        return j % 6 == 0
    return False


def iter_shard_urls(spec: WebSpec, k: int, i: int) -> Iterator[str]:
    """URLs of one synthesis shard: shard (k, -1) is the host's root+about,
    shard (k, i>=0) is section i. Sections are the unit of PARALLEL corpus
    synthesis — a hot host's pages spread over its n_secs shards instead of
    serializing on one executor."""
    host = spec.host(k)
    if i < 0:
        yield f"https://{host}/"
        yield f"https://{host}/about"
        return
    yield f"https://{host}/sec{i}"
    for j in range(spec.n_pages(k, i)):
        base = f"https://{host}/sec{i}/page{j}.html"
        yield base
        yield base + "?v=1"
        if j % 3 == 0:
            yield f"https://{host}/sec{i}/page{j}/extra"
        if j % 6 == 0:
            yield f"https://{host}/sec{i}/page{j}/extra/more"


def iter_shards(spec: WebSpec) -> Iterator[Tuple[int, int]]:
    for k in range(spec.n_hosts):
        yield (k, -1)
        for i in range(spec.n_secs(k)):
            yield (k, i)


def iter_host_urls(spec: WebSpec, k: int) -> Iterator[str]:
    yield from iter_shard_urls(spec, k, -1)
    for i in range(spec.n_secs(k)):
        yield from iter_shard_urls(spec, k, i)


def iter_urls(spec: WebSpec) -> Iterator[str]:
    for k in range(spec.n_hosts):
        yield from iter_host_urls(spec, k)


# ---------------------------------------------------------------------------
# Page rendering
# ---------------------------------------------------------------------------

def _salad(seedparts, n: int, start_cap: bool = True) -> str:
    words = []
    for t in range(n):
        words.append(_WORDS[_h(*seedparts, t) % len(_WORDS)])
    text = " ".join(words)
    return (text[0].upper() + text[1:]) if (start_cap and text) else text


def _nav_block() -> str:
    return (
        '<nav><a href="/">Home</a> <a href="/about">About</a> '
        '<a href="https://external.example/hub">Partners</a></nav>'
    )


def _footer_block(host: str) -> str:
    return (
        f"<footer><p>Copyright 2025 {host}. All rights reserved. "
        f'<a href="/privacy">Privacy Policy</a></p></footer>'
    )


def page_html(spec: WebSpec, url: str) -> Optional[str]:
    """Full deterministic HTML for ``url``, or ``None`` when the synthetic web
    404s it (the engine's fetch-failure path)."""
    if not page_exists(spec, url):
        return None
    k, path, query = _parse_site(spec, url)  # type: ignore[misc]
    host = spec.host(k)
    hv = _h(spec.seed, "page", url)
    segs = [s for s in path.strip("/").split("/") if s]

    title_salad = _salad((spec.seed, "title", url), 3)
    body: list[str] = []
    links: list[str] = []

    if path == "/":
        title = f"{host} home — {title_salad}"
        body.append(f"<h1>Welcome to {host} {title_salad}</h1>")
        body.append(f"<p>{_salad((spec.seed, 'intro', url), 28)}.</p>")
        for i in range(spec.n_secs(k)):
            links.append(f'<a href="/sec{i}/">Section {i} archive index</a>')  # trailing slash → canon strip
        links.append(f'<a href="/sec0/page0.html">featured deep page</a>')
        links.append(f'<a href="/missing{hv % 5}">stale link</a>')  # dangles → fetch fail
    elif path == "/about":
        title = f"About {host}"
        body.append(f"<h1>About the {title_salad} project</h1>")
        body.append(f"<p>{_salad((spec.seed, 'about', url), 24)}.</p>")
        links.append('<a href="/">back home</a>')
    elif len(segs) == 1:  # section index
        i = int(segs[0][3:])
        title = f"Section {i} of {host} — {title_salad}"
        body.append(f"<h1>Section {i} catalog {title_salad}</h1>")
        body.append(f"<p>{_salad((spec.seed, 'sec', url), 26)}.</p>")
        for j in range(spec.n_pages(k, i)):
            links.append(f'<a href="/sec{i}/page{j}.html">entry {j} {_salad((spec.seed, "l", url, j), 2, False)}</a>')
        if i + 1 < spec.n_secs(k):
            links.append(f'<a href="/sec{i + 1}">next section</a>')
    elif len(segs) == 2:  # leaf page (and its ?v=1 variant)
        i, j = int(segs[0][3:]), int(segs[1][4:-5])
        variant = " (print view)" if query else ""
        title = f"{_salad((spec.seed, 'ptitle', host, i, j), 4)}{variant}"
        body.append(f"<h1>{title}</h1>")
        if hv % 7 == 0 and not query:
            body.append("<p>stub.</p>")  # <100 chars → fallback path (crawler.py:475-484)
        else:
            for para in range(3 + hv % 4):
                body.append(f"<p>{_salad((spec.seed, 'para', url, para), 22 + (hv + para) % 9)}.</p>")
            if hv % 3 == 0:
                body.append(f"<p>Note: {_salad((spec.seed, 'note', url), 9, False)}.</p>")
            if hv % 5 == 0:
                body.append(f"<pre>spark.conf.set('{_salad((spec.seed, 'code', url), 2, False)}', {hv % 97})</pre>")
            if hv % 4 == 0:
                body.append("<ul>" + "".join(
                    f"<li>{_salad((spec.seed, 'li', url, t), 5, False)} detail row</li>" for t in range(3)
                ) + "</ul>")
        links.append(f'<a href="page{(j + 1) % spec.n_pages(k, i)}.html">next entry</a>')  # relative href
        links.append(f'<a href="page{(j + 1) % spec.n_pages(k, i)}.html">next entry (dup)</a>')
        links.append(f'<a href="/sec{i}/page{j}.html?v=1">print view</a>')
        links.append('<a href="#top">top anchor</a>')  # fragment-only → canon collapses to self
        links.append(f'<a href="https://site{(k + 1) % spec.n_hosts}.example/">mirror site</a>')  # external
        if j % 3 == 0:
            links.append(f'<a href="/sec{i}/page{j}/extra">supplementary notes</a>')
    elif len(segs) == 3:  # /extra
        i, j = int(segs[0][3:]), int(segs[1][4:])
        title = f"Extra notes {i}/{j} {title_salad}"
        body.append(f"<h1>{title}</h1>")
        body.append(f"<p>{_salad((spec.seed, 'extra', url), 30)}.</p>")
        if j % 6 == 0:
            links.append(f'<a href="/sec{i}/page{j}/extra/more">even more</a>')
        links.append(f'<a href="/sec{i}/page{j}.html">back to entry</a>')
    else:  # /extra/more
        i, j = int(segs[0][3:]), int(segs[1][4:])
        title = f"Deep appendix {i}/{j} {title_salad}"
        body.append(f"<h1>{title}</h1>")
        body.append(f"<p>{_salad((spec.seed, 'more', url), 34)}.</p>")
        links.append(f'<a href="/sec{i}">section home</a>')

    desc = _salad((spec.seed, "desc", url), 10, False)
    link_html = " ".join(links)
    return (
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{desc}">'
        "</head><body>"
        + _nav_block()
        + '<div class="breadcrumb"><a href="/">Home</a></div>'
        + f'<article class="post-content">{"".join(body)}'
        + f"<p>Related: {link_html}</p></article>"
        + _footer_block(host)
        + "</body></html>"
    )


def page_row(spec: WebSpec, url: str, golden_text: bool = True) -> Optional[dict]:
    """One row of the pages table: (url, warc_ts, html, text, lang).

    ``golden_text=False`` skips the kernel extraction for the ``text`` column —
    parity fixtures need the golden text, bench corpora don't (the engine
    extracts its own), and skipping it halves synthesis cost."""
    html = page_html(spec, url)
    if html is None:
        return None
    raw = html.encode("utf-8")
    return {
        "url": url,
        "warc_ts": EPOCH + timedelta(seconds=_h(spec.seed, "ts", url) % (30 * 86400)),
        "html": raw,
        "text": extract_text(raw, url) if golden_text else None,
        "lang": _LANGS[_h(spec.seed, "lang", url) % len(_LANGS)],
    }


def iter_pages(spec: WebSpec) -> Iterator[dict]:
    for url in iter_urls(spec):
        row = page_row(spec, url)
        if row is not None:
            yield row
