"""Filename / output-path generation and the metadata front-matter format.

Parity targets (reference file:line):
* ``url_to_filename``      ≙ ContentCrawler.url_to_filename (crawler.py:361-386)
* ``generate_filename``    ≙ OutputManager._generate_filename (output_manager.py:294-342)
* ``clean_filename``       ≙ OutputManager._clean_filename (output_manager.py:344-365)
* ``output_rel_path``      ≙ OutputManager.get_file_path strategies (output_manager.py:229-292)
* ``custom_pattern_path``  ≙ OutputManager._apply_custom_pattern (output_manager.py:367-396)
* ``format_with_metadata`` ≙ OutputManager._format_content_with_metadata (output_manager.py:477-500)

Determinism: the reference stamps ``datetime.now()`` into timestamp-named
files and date-organized paths. This engine threads an explicit ``run_ts``
(a ``datetime``) instead — same formats, reproducible output.
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime
from typing import Dict, Optional
from crawl4ai_scraper_spark.kernel.urls import safe_urlparse as urlparse

MAX_FILENAME_LENGTH = 255  # output_manager default

# Strategies / conventions (output_manager.py constants)
FLAT, MIRROR, DOMAIN, DATE, CUSTOM = "flat", "mirror", "domain", "date", "custom"
URL_BASED, TITLE_BASED, TIMESTAMP, HASH = "url_based", "title_based", "timestamp", "hash"

_URL_FILENAME_BAD = "/\\:*?\"<>|"  # the nine characters replaced (crawler.py:369-377)
_TITLE_STRIP_RX = re.compile(r"[^\w\s-]")
_TITLE_SEP_RX = re.compile(r"[-\s]+")
_BRACES_RX = re.compile(r"{[^}]*}")


def url_to_filename(url: str) -> str:
    """netloc+path, invalid chars → ``_``, strip edge underscores, ensure
    ``.md`` (crawler.py:361-386)."""
    parts = urlparse(url)
    name = parts.netloc + parts.path
    for ch in _URL_FILENAME_BAD:
        name = name.replace(ch, "_")
    name = name.strip("_")
    if not name.endswith(".md"):
        name += ".md"
    return name


def clean_filename(filename: str) -> str:
    """OS-safe cleanup (output_manager.py:344-365): strip ``<>:"|?*``, drop
    control chars, cap at max-3 (reserving ``.md``), rstrip ``. ``, fall back
    to ``unnamed``."""
    for ch in '<>:"|?*':
        filename = filename.replace(ch, "_")
    filename = "".join(c for c in filename if ord(c) >= 32)
    if len(filename) > MAX_FILENAME_LENGTH - 3:
        filename = filename[: MAX_FILENAME_LENGTH - 3]
    filename = filename.rstrip(". ")
    return filename or "unnamed"


def generate_filename(
    url: str,
    title: str = "Untitled",
    convention: str = URL_BASED,
    run_ts: Optional[datetime] = None,
    timestamp_format: str = "%Y%m%d_%H%M%S",
) -> str:
    """The four naming conventions (output_manager.py:294-342)."""
    base = ""
    if convention == URL_BASED:
        parts = urlparse(url)
        domain = parts.netloc.replace("www.", "")
        path = parts.path.strip("/")
        if path:
            base = f"{domain}_{path.replace('/', '_').replace('-', '_')}"
        else:
            base = domain
    elif convention == TITLE_BASED:
        base = _TITLE_STRIP_RX.sub("", title.lower())
        base = _TITLE_SEP_RX.sub("_", base)
    elif convention == TIMESTAMP:
        stamp = (run_ts or datetime(2025, 1, 1)).strftime(timestamp_format)
        domain = urlparse(url).netloc.replace("www.", "") or "unknown"
        base = f"{domain}_{stamp}"
    elif convention == HASH:
        digest = hashlib.md5(url.encode()).hexdigest()[:12]
        domain = urlparse(url).netloc.replace("www.", "") or "unknown"
        base = f"{domain}_{digest}"
    base = clean_filename(base)
    if not base.endswith(".md"):
        base += ".md"
    return base


def _safe_host(netloc: str) -> str:
    """Directory-safe host component: a hostile URL's netloc can be '..'
    (``https://../evil``), which would escape the output root as a path
    segment - map the traversal-capable values to 'unknown'."""
    return netloc if netloc not in ("", ".", "..") else "unknown"


def _safe_path_seg(seg: str) -> str:
    """Same traversal guard for the CUSTOM strategy's ``{path}`` variable:
    a URL whose whole path is ``/..`` (or ``/.``) survives strip+replace
    unchanged and would escape the output root — map it to ''."""
    return seg if seg not in (".", "..") else ""


def custom_pattern_path(
    url: str,
    filename: str,
    pattern: str = "{domain}/{filename}",
    run_ts: Optional[datetime] = None,
) -> str:
    """``{var}`` substitution; unresolved braces are stripped
    (output_manager.py:367-396)."""
    parts = urlparse(url)
    now = run_ts or datetime(2025, 1, 1)
    variables = {
        "domain": _safe_host(parts.netloc.replace("www.", "")),
        "subdomain": parts.netloc.split(".")[0] if "." in parts.netloc else "",
        "path": _safe_path_seg(parts.path.strip("/").replace("/", "_")),
        "year": now.strftime("%Y"),
        "month": now.strftime("%m"),
        "day": now.strftime("%d"),
        "date": now.strftime("%Y%m%d"),
        "filename": filename,
    }
    out = pattern
    for key, value in variables.items():
        out = out.replace("{%s}" % key, value)
    return _BRACES_RX.sub("", out)


def output_rel_path(
    url: str,
    title: str = "Untitled",
    strategy: str = FLAT,
    convention: str = URL_BASED,
    run_ts: Optional[datetime] = None,
    pattern: str = "{domain}/{filename}",
) -> str:
    """Relative output path per organization strategy
    (output_manager.py:229-292). Returned as a POSIX-style relative string —
    the engine's documents_out table stores it; file fan-out is optional."""
    filename = generate_filename(url, title, convention, run_ts)
    parts = urlparse(url)
    host = _safe_host(parts.netloc)
    if strategy == MIRROR:
        url_path = parts.path.strip("/")
        if url_path:
            pieces = url_path.split("/")
            if "." in pieces[-1]:  # drop trailing file-ish component (262-263)
                pieces = pieces[:-1]
            # deliberate deviation from the reference: '..'/'.'/'' path
            # segments in a (hostile) URL must never become directory
            # components — a '..' here is a path-traversal escape out of the
            # output root. The reference writes them verbatim; we drop them.
            pieces = [p for p in pieces if p not in ("", ".", "..")]
            if pieces:
                return "/".join([host, *pieces, filename])
        return f"{host}/{filename}"
    if strategy == DOMAIN:
        return f"{host}/{filename}"
    if strategy == DATE:
        return f"{(run_ts or datetime(2025, 1, 1)).strftime('%Y/%m/%d')}/{filename}"
    if strategy == CUSTOM:
        return custom_pattern_path(url, filename, pattern, run_ts)
    return filename  # FLAT and any unknown strategy


def format_with_metadata(content: Dict, run_ts: Optional[datetime] = None) -> str:
    """YAML-ish front matter + ``# title`` + markdown, replicating the naive
    (unescaped) ``key: value`` emission and fixed key order of
    output_manager.py:477-500 — including the missing newline between the
    closing ``---`` block's trailing empty line and the title."""
    crawled_at = content.get("crawled_at")
    if not crawled_at:
        crawled_at = (run_ts or datetime(2025, 1, 1)).isoformat()
    meta = {
        "url": content.get("url", ""),
        "title": content.get("title", "Untitled"),
        "description": content.get("description", ""),
        "crawled_at": crawled_at,
        "content_length": content.get("content_length", 0),
        "capture_mode": "enhanced",
    }
    header = ["---"] + [f"{k}: {v}" for k, v in meta.items()] + ["---", ""]
    title = content.get("title", "Untitled")
    markdown = content.get("markdown", "")
    return "\n".join(header) + f"# {title}\n\n{markdown}"


def basic_markdown_doc(title: str, markdown: str) -> str:
    """Fallback document body when no output manager is configured
    (crawler.py:536-545): ``# {title}\\n\\n{markdown}\\n``."""
    return f"# {title}\n\n{markdown}\n"
