"""Deterministic HTML → (links, title, description, markdown, cleaned text).

The reference delegates fetching + rendering to a headless browser and takes
``result.markdown`` / ``result.links`` / ``result.cleaned_html`` from crawl4ai
(crawler.py:460-472). In this engine "the web" is a table, so this module IS
the fetch result: a pure, stdlib-only (html.parser) renderer that both the
sequential oracle and the Arrow UDFs call. Byte-identical text parity between
oracle and Spark holds by construction because both run these exact functions;
the golden ``text`` column of the synthetic pages table is produced by the
same code at generation time.

Mirrors of the reference's fetch configuration:
* excluded_tags nav/footer/header/aside (crawler.py:434) — those subtrees are
  dropped from markdown and cleaned text output.
* link ordering — in-document order, internal/external split by host equality
  of the resolved absolute URL (crawl4ai's links dict; consumed at
  crawler.py:210-230). Duplicates are preserved; dedup is the BFS's job.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple
from urllib.parse import urljoin, urlparse

# Subtrees never rendered into markdown / cleaned text.
_DROP_TAGS = frozenset(
    ["script", "style", "noscript", "template", "svg", "iframe",
     "nav", "footer", "header", "aside"]  # crawler.py:434 excluded_tags
)
_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}
# Tags that terminate the current text block.
_BLOCK_TAGS = frozenset(
    ["p", "div", "section", "article", "main", "ul", "ol", "table", "tr",
     "td", "th", "br", "hr", "form", "figure"]
) | frozenset(_HEADING_LEVEL) | frozenset(["li", "pre", "blockquote"])

_WS_RX = re.compile(r"\s+")


class _PageParser(HTMLParser):
    """Single-pass extraction of links, title, meta description and markdown
    blocks. Line-oriented, append-only — O(page size)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: List[Tuple[str, str]] = []  # (href, anchor-ish tag context)
        self.title_parts: List[str] = []
        self.description: Optional[str] = None
        self.canonical: Optional[str] = None  # first <link rel=canonical href>
        self.meta_robots: Optional[str] = None  # first <meta name=robots content>
        self.blocks: List[str] = []
        self._drop_depth = 0
        self._in_title = False
        self._in_pre = False
        self._buf: List[str] = []
        self._prefix = ""
        self._href_stack: List[str] = []
        self._anchor_text: List[str] = []
        self._link_idx_stack: List[int] = []  # position in self.links per open <a>

    # -- block plumbing ----------------------------------------------------
    def _flush(self) -> None:
        text = "".join(self._buf)
        if self._in_pre:
            block = text.strip("\n")
            if block.strip():
                self.blocks.append(f"```\n{block}\n```")
        else:
            norm = _WS_RX.sub(" ", text).strip()
            if norm:
                self.blocks.append(self._prefix + norm)
        self._buf = []
        self._prefix = ""

    # -- parser hooks --------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        amap = dict(attrs)
        if tag == "a":
            href = (amap.get("href") or "").strip()
            if href:
                self.links.append((href, ""))
                self._href_stack.append(href)
                self._anchor_text.append("")
                self._link_idx_stack.append(len(self.links) - 1)
        if tag == "meta":
            name = (amap.get("name") or "").lower()
            if self.description is None and name == "description":
                self.description = amap.get("content") or ""
            if self.meta_robots is None and name == "robots":
                self.meta_robots = (amap.get("content") or "").strip().lower()
        if tag == "link" and self.canonical is None:
            rel = (amap.get("rel") or "").lower().split()
            if "canonical" in rel:
                href = (amap.get("href") or "").strip()
                if href:
                    self.canonical = href
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = True
        elif tag in _HEADING_LEVEL:
            self._flush()
            self._prefix = "#" * _HEADING_LEVEL[tag] + " "
        elif tag == "li":
            self._flush()
            self._prefix = "- "
        elif tag == "blockquote":
            self._flush()
            self._prefix = "> "
        elif tag == "pre":
            self._flush()
            self._in_pre = True
        elif tag == "code" and not self._in_pre:
            self._buf.append("`")
        elif tag in ("strong", "b"):
            self._buf.append("**")
        elif tag in ("em", "i"):
            self._buf.append("*")
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._href_stack:
            href = self._href_stack.pop()
            label = _WS_RX.sub(" ", self._anchor_text.pop()).strip()
            self.links[self._link_idx_stack.pop()] = (href, label)
            if not self._drop_depth:
                self._buf.append(f"[{label}]({href})")
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = False
        elif tag == "pre":
            self._flush()
            self._in_pre = False
        elif tag == "code" and not self._in_pre:
            self._buf.append("`")
        elif tag in ("strong", "b"):
            self._buf.append("**")
        elif tag in ("em", "i"):
            self._buf.append("*")
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._drop_depth:
            return
        if self._href_stack:
            # Anchor text renders via the [label](href) form at </a>.
            self._anchor_text[-1] += data
            return
        self._buf.append(data)

    def close(self) -> None:  # flush trailing block
        super().close()
        self._flush()


# Fast tokenizer for the well-formed-subset fast path: standard tags with
# double-quoted or bare attributes only. Anything it cannot tokenize EXACTLY
# (single quotes, comments, CDATA, declarations, stray angle brackets, script
# bodies containing '<') is detected by the gap check below and falls back to
# html.parser. The token stream drives the SAME _PageParser handler methods,
# so the fast path can only differ from the slow one by tokenization — which
# the gap check makes loss-free — and is differential-tested over the full
# synthetic corpus (tests/test_kernel.py).
_FAST_TAG_RX = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_][a-zA-Z0-9_.:\-]*(?:=\"[^\"<>]*\")?)*)\s*(/?)>"
)
_FAST_ATTR_RX = re.compile(r"([a-zA-Z_][a-zA-Z0-9_.:\-]*)(?:=\"([^\"]*)\")?")


def _fast_feed(html: str, parser: _PageParser) -> bool:
    """Drive the parser's handler methods from a regex token stream. Returns
    False (parser untouched semantically — caller must restart) when the
    document contains anything outside the verified subset."""
    import html as _htmlmod

    events = []
    pos = 0
    while True:
        m = _FAST_TAG_RX.search(html, pos)
        if m is None:
            break
        gap = html[pos:m.start()]
        if "<" in gap or ">" in gap:
            return False  # comment / decl / single-quoted attr / raw '<'
        if gap:
            events.append((None, _htmlmod.unescape(gap) if "&" in gap else gap, None))
        closing, tag, rawattrs, selfclose = m.groups()
        tag = tag.lower()
        pos = m.end()
        if closing:
            events.append((False, tag, None))
            continue
        if rawattrs:
            attrs = [
                (am.group(1).lower(),
                 None if am.group(2) is None
                 else (_htmlmod.unescape(am.group(2)) if "&" in am.group(2)
                       else am.group(2)))
                for am in _FAST_ATTR_RX.finditer(rawattrs)
            ]
        else:
            attrs = []
        events.append((True, tag, attrs))
        if selfclose:
            events.append((False, tag, None))
        elif tag in ("script", "style"):
            # CDATA content element (html.parser semantics): everything up to
            # the matching close tag is raw data — tags/charrefs inert inside.
            cm = re.compile(rf"</\s*{tag}\s*>", re.IGNORECASE).search(html, pos)
            if cm is None:
                # Unterminated CDATA: html.parser DISCARDS the content
                # (goahead() breaks without a handle_data when cdata_elem is
                # set and no close tag arrives) — emit nothing, not the tail.
                pos = len(html)
                break
            if html[pos:cm.start()]:
                events.append((None, html[pos:cm.start()], None))
            events.append((False, tag, None))
            pos = cm.end()
    tail = html[pos:]
    if "<" in tail or ">" in tail:
        return False
    if tail:
        events.append((None, _htmlmod.unescape(tail) if "&" in tail else tail, None))

    start, data, end = parser.handle_starttag, parser.handle_data, parser.handle_endtag
    for kind, payload, attrs in events:
        if kind is None:
            data(payload)
        elif kind:
            start(payload, attrs)
        else:
            end(payload)
    parser._flush()
    return True


def _parse(html: str) -> _PageParser:
    parser = _PageParser()
    try:
        if _fast_feed(html, parser):
            return parser
    except Exception:
        pass  # any fast-path surprise → full restart on html.parser
    parser = _PageParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed HTML: keep whatever was parsed so far (never raise —
        # a fetch in the reference would degrade, not crash the crawl).
        parser._flush()
    return parser


def decode_html(html) -> str:
    """Pages store html as binary (BASELINE.json input_hint); decode utf-8
    with replacement so no page can poison a batch."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return str(html)


def page_title(html: str) -> Optional[str]:
    p = _parse(html)
    if not p.title_parts:
        return None
    return _WS_RX.sub(" ", "".join(p.title_parts)).strip()


def page_description(html: str) -> str:
    return _parse(html).description or ""


# An href with an explicit scheme ("https:", "mailto:", …) or a scheme-
# relative "//host/…" prefix can land on another host; anything else (path-
# absolute, relative, query- or fragment-only) resolves within the page's
# own authority, so ``urljoin``+``urlparse`` can be skipped for it — the
# overwhelmingly common case in real pages.
_MAYBE_CROSS_HOST_RX = re.compile(r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*:|//)")


def _link_is_internal(href: str, base_url: str, base_host: str) -> Optional[bool]:
    """True/False internal classification; None for UNPARSEABLE hrefs
    (``http://[`` → "Invalid IPv6 URL") — the extractors drop those links
    entirely, because a single hostile href on one page must never crash
    the Arrow extraction pass (the URL could not be fetched anyway)."""
    if not _MAYBE_CROSS_HOST_RX.match(href):
        return True
    try:
        return urlparse(urljoin(base_url, href)).netloc == base_host
    except ValueError:
        return None


def _iter_kept_links(pairs, base_url: str, base_host: str):
    """THE drop-unparseable-href rule, in one place: yield
    ``(pos, href, label, is_internal)`` for every parseable href,
    renumbering positions after drops — every extractor (extract_links,
    extract_anchors, scan_links, fetch_render) iterates through this so
    link_pos numbering can never desynchronize between them."""
    pos = 0
    for href, label in pairs:
        internal = _link_is_internal(href, base_url, base_host)
        if internal is None:  # unparseable href — dropped, not crashed
            continue
        yield pos, href, label, internal
        pos += 1


def extract_links(html: str, base_url: str) -> List[Dict]:
    """All non-empty hrefs in document order with 0-based position and an
    internal/external flag (host equality of the resolved URL vs the page —
    the classification crawl4ai feeds to crawler.py:210-230)."""
    base_host = urlparse(base_url).netloc
    return [
        {"href": href, "link_pos": pos, "is_internal": internal}
        for pos, href, _, internal in _iter_kept_links(_parse(html).links, base_url, base_host)
    ]


def extract_anchors(html: str, base_url: str) -> List[Dict]:
    """Inbound-link material: every non-empty href with its rendered anchor
    label (whitespace-collapsed, stripped — the exact ``[label](href)`` label
    the markdown renderer emits) and the link's CANONICAL target URL
    (urljoin + fragment/trailing-slash canonicalization, same code path the
    frontier uses). Anchors inside drop-tags (nav/footer/...) surface with an
    empty label — their text never rendered — and unterminated ``<a>`` tags
    keep the empty label too; callers filter empties for anchor corpora.

    This is the per-page half of the anchor-text aggregation operator
    (operators/graph.py anchor_text_agg): the web-search/document-expansion
    view of the link graph the reference only stores as url_relationships
    (crawler.py:227-230)."""
    from crawl4ai_scraper_spark.kernel.urls import canon_url

    base_host = urlparse(base_url).netloc
    return [
        {"target": canon_url(href, base_url), "anchor": label, "link_pos": pos}
        for pos, href, label, _ in _iter_kept_links(_parse(html).links, base_url, base_host)
    ]


# --- fast links-only scanner (discovery hot path) --------------------------
# Discovery needs ONLY (href, pos, is_internal) — rendering markdown for that
# via the full HTMLParser costs ~0.7 ms/page; this regex scanner is ~10×
# cheaper and is differentially tested against ``extract_links`` (the
# HTMLParser ground truth) in tests/test_kernel.py. Semantics replicated:
# comments and the CDATA rawtext blocks html.parser recognizes (script/style)
# never yield links; the LAST href attribute of a tag wins (HTMLParser builds
# a dict from the attr list); entity references in attribute values are
# unescaped (convert_charrefs=True); href is stripped; empty hrefs are
# dropped by the parser hook, so they are dropped here too. Note <a> inside
# nav/template/noscript DOES yield a link — the parser hook collects hrefs
# before the drop-tag check, replicating crawl4ai's link census.

_STRIP_BLOCKS_RX = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<(script|style)\b[^>]*>.*?(?:</\1\s*>|$)",
    re.S | re.I,
)
_A_TAG_RX = re.compile(r"""<a(?=[\s/>])((?:[^>"']|"[^"]*"|'[^']*')*)>""", re.I | re.S)
_HREF_RX = re.compile(
    r"""(?<![\w\-.:])href(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))|(?=[\s/>]|$))""",
    re.I,
)


def _scan_hrefs(html: str):
    """Regex-scanned ``(href, label=None)`` pairs — the fast-path equivalent
    of ``_parse(html).links`` (labels are not extracted on this path)."""
    import html as _htmlmod

    cleaned = _STRIP_BLOCKS_RX.sub(" ", html)
    for m in _A_TAG_RX.finditer(cleaned):
        attrs = m.group(1) or ""
        href_val = None
        for hm in _HREF_RX.finditer(attrs):
            if hm.group(1) is not None:
                href_val = hm.group(1)
            elif hm.group(2) is not None:
                href_val = hm.group(2)
            elif hm.group(3) is not None:
                href_val = hm.group(3)
            else:
                href_val = ""  # bare ``href`` with no value → empty string
        if href_val is None:
            continue  # no href attribute at all → not in parser.links either
        if "&" in href_val:
            href_val = _htmlmod.unescape(href_val)
        href = href_val.strip()
        if href:  # empty hrefs are dropped by the parser hook too
            yield href, None


def scan_links(html: str, base_url: str) -> List[Dict]:
    """Fast path for ``extract_links``: identical output, no markdown work."""
    base_host = urlparse(base_url).netloc
    return [
        {"href": href, "link_pos": pos, "is_internal": internal}
        for pos, href, _, internal in _iter_kept_links(_scan_hrefs(html), base_url, base_host)
    ]


def html_to_markdown(html: str) -> str:
    """Deterministic markdown rendering: heading prefixes, ``- `` list items,
    fenced ``pre`` blocks, ``[label](href)`` links, blocks joined by blank
    lines. This is the engine's stand-in for crawl4ai's DefaultMarkdownGenerator
    output (crawler.py:437-443)."""
    return "\n\n".join(_parse(html).blocks)


def _cleaned_from_blocks(blocks: List[str]) -> str:
    plain = []
    for block in blocks:
        # Strip the markdown affordances for the "cleaned html" view.
        text = block
        if text.startswith("```"):
            text = text.strip("`\n")
        text = re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", text)
        text = text.lstrip("#>- ").strip()
        if text:
            plain.append(text)
    return "\n".join(plain)


def cleaned_html_of(html: str) -> str:
    """The engine's stand-in for crawl4ai's ``result.cleaned_html``
    (crawler.py:481): boilerplate subtrees dropped, remaining text blocks
    joined by single newlines, whitespace-normalized."""
    return _cleaned_from_blocks(_parse(html).blocks)


def fetch_render(html, url: str) -> Dict:
    """One-stop render of a stored page: everything crawl_single_url reads
    from the crawl4ai result object (crawler.py:465-496)."""
    text = decode_html(html)
    parser = _parse(text)  # ONE parse feeds links, title, markdown AND cleaned_html
    title = _WS_RX.sub(" ", "".join(parser.title_parts)).strip() if parser.title_parts else None
    base_host = urlparse(url).netloc
    links = []
    internal = external = 0
    for pos, href, _, is_internal in _iter_kept_links(parser.links, url, base_host):
        internal += is_internal
        external += not is_internal
        links.append({"href": href, "link_pos": pos, "is_internal": is_internal})
    markdown = "\n\n".join(parser.blocks)
    return {
        "title": title if title is not None else "Untitled",
        "description": parser.description or "",
        "markdown": markdown,
        "cleaned_html": _cleaned_from_blocks(parser.blocks),
        "links": links,
        "links_internal": internal,
        "links_external": external,
    }


def page_canonical(html: str, base_url: str) -> Optional[str]:
    """The page's declared canonical URL (first ``<link rel=canonical>``),
    resolved against the page URL — or None if absent/unresolvable. The
    reference scraper ignores rel=canonical (selector_utils/crawler have no
    canonical handling); this is additive crawl hygiene: canonical groups
    are the publisher-declared duplicate clusters (print views, tracking-
    parameter variants, m.-mirrors) that content hashing only catches after
    fetching both copies."""
    return _canonical_from(_parse(html), base_url)


def _canonical_from(p, base_url: str) -> Optional[str]:
    if not p.canonical:
        return None
    try:
        return urljoin(base_url, p.canonical)
    except ValueError:
        return None


def page_meta_robots(html: str) -> Dict[str, bool]:
    """``<meta name=robots>`` directives as flags. ``none`` = noindex +
    nofollow (the HTML spec's shorthand); absent meta → both False
    (indexable, followable — the crawler default)."""
    return _robots_from(_parse(html))


def _robots_from(p) -> Dict[str, bool]:
    # commas OR whitespace: real pages write both "noindex, nofollow" and
    # "noindex nofollow"; every major crawler accepts either separator
    toks = {t for t in re.split(r"[,\s]+", (p.meta_robots or "")) if t}
    return {
        "noindex": "noindex" in toks or "none" in toks,
        "nofollow": "nofollow" in toks or "none" in toks,
    }


def page_meta_fields(html: str, base_url: str) -> Tuple[Optional[str], bool, bool]:
    """(canonical, noindex, nofollow) from ONE parse — the hygiene Arrow
    pass (operators/webmeta.py) wants both canonical and robots flags per
    page, and parsing is its dominant cost, so it must not run
    ``page_canonical`` + ``page_meta_robots`` back-to-back (two full parses
    of every page)."""
    p = _parse(html)
    r = _robots_from(p)
    return _canonical_from(p, base_url), r["noindex"], r["nofollow"]


class _TableParser(HTMLParser):
    """Minimal stdlib table collector (no bs4/lxml in this environment —
    the htmlkit convention): tables in document order of their <table> open
    tag, rows/cells assigned to the INNERMOST open table, cell text
    whitespace-collapsed. Tolerates unclosed td/tr/table (closed implicitly
    by the next opener or EOF) — real web tables are routinely malformed."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: List[List[List[str]]] = []
        self._stack: List[List[List[str]]] = []  # open tables
        self._rows: List[List[List[str]]] = []  # open row per stack level
        self._cells: List[Optional[List[str]]] = []  # open cell per level

    def _close_cell(self):
        if self._stack and self._cells[-1] is not None:
            txt = " ".join("".join(self._cells[-1]).split())
            self._rows[-1].append(txt)
            self._cells[-1] = None

    def _close_row(self):
        self._close_cell()
        if self._stack and self._rows[-1] is not None and self._rows[-1] != []:
            self._stack[-1].append(self._rows[-1])
        if self._stack:
            self._rows[-1] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            t: List[List[str]] = []
            self.tables.append(t)
            self._stack.append(t)
            self._rows.append([])
            self._cells.append(None)
        elif tag == "tr" and self._stack:
            self._close_row()
        elif tag in ("td", "th") and self._stack:
            self._close_cell()
            self._cells[-1] = []

    def handle_endtag(self, tag):
        if tag == "table" and self._stack:
            self._close_row()
            self._stack.pop()
            self._rows.pop()
            self._cells.pop()
        elif tag == "tr" and self._stack:
            self._close_row()
        elif tag in ("td", "th") and self._stack:
            self._close_cell()

    def handle_data(self, data):
        if self._stack and self._cells[-1] is not None:
            self._cells[-1].append(data)


def page_tables(html) -> List[List[List[str]]]:
    """All <table> grids of a page as [table][row][cell] text — the
    structured-scrape surface next to the selector engine (a user scraping
    price/specs tables gets rows, not a text blob). Document order, nested
    tables reported separately (their cells excluded from the parent's)."""
    p = _TableParser()
    try:
        p.feed(decode_html(html))
        p.close()
    except Exception:
        pass
    # EOF-close any unclosed tables
    while p._stack:
        p.handle_endtag("table")
    return [t for t in p.tables if t]
