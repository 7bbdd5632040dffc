"""URL canonicalization, domain logic and wildcard pattern matching.

Semantics-parity notes (reference = /root/reference, read-only):

* ``canon_url``          ≙ URLDiscovery.normalize_url       (crawler.py:150-165)
* ``extract_domain``     ≙ URLDiscovery.extract_domain      (crawler.py:141-144)
* ``is_same_domain``     ≙ URLDiscovery.is_same_domain      (crawler.py:146-148)
* ``wildcard_to_regex``  ≙ URLPatternHandler.convert_wildcard_to_regex
                                                            (crawler.py:84-109)
* ``match_url_pattern``  ≙ URLPatternHandler.match_url_pattern
                                                            (crawler.py:111-130)
* ``fixup_scheme``       ≙ the interactive prompts' https:// prefixing
                                                            (main.py:247-249)

Quirks preserved on purpose (these are part of the byte/set-parity contract):

* In ``wildcard_to_regex`` the escaping pass runs BEFORE wildcard conversion
  and ``?`` is translated AFTER the escape table, so a literal ``?`` cannot be
  expressed in a pattern — it always means "any single character".
* ``canon_url`` keeps the query string, drops the fragment, and strips one
  trailing slash only when the path is longer than "/" — note the length test
  is on the PATH while the strip is applied to the assembled URL, exactly as
  the reference does it.
* Matching uses ``re.match`` (anchored at the start by construction, at the
  end by the generated ``$``).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional
from urllib.parse import urljoin, urlparse

# Escape table applied before wildcard translation. Deliberately the same
# character set the reference escapes (crawler.py:92-101): regex
# metacharacters minus '*' and '?', which carry wildcard meaning.
_ESCAPED_CHARS = ".+^$()[]{}"

_DOUBLESTAR_TOKEN = "\x00DSTAR\x00"


def fixup_scheme(url: str) -> str:
    """Prefix ``https://`` when no scheme is present (main.py:247-249)."""
    u = url.strip()
    if not u:
        return u
    if not u.startswith(("http://", "https://")):
        return "https://" + u
    return u


def safe_urlparse(url: str):
    """urlparse that never raises: malformed URLs ("http://[" → "Invalid
    IPv6 URL") parse as the empty URL instead of poisoning an Arrow batch."""
    try:
        return urlparse(url)
    except ValueError:
        return urlparse("")


def canon_url(url: str, base_url: Optional[str] = None) -> str:
    """Resolve against ``base_url``, drop the fragment, keep the query,
    strip a trailing slash unless the path is the root (crawler.py:150-165).

    Malformed URLs (``http://[`` raises "Invalid IPv6 URL" from urlparse)
    come back UNCHANGED instead of raising: one hostile href on one crawled
    page must never poison a whole Arrow batch. Link extraction drops such
    hrefs before they reach the frontier (see htmlkit)."""
    try:
        if base_url:
            url = urljoin(base_url, url)
        parts = urlparse(url)
    except ValueError:
        return url
    out = f"{parts.scheme}://{parts.netloc}{parts.path}"
    if parts.query:
        out += f"?{parts.query}"
    if out.endswith("/") and len(parts.path) > 1:
        out = out[:-1]
    return out


def extract_domain(url: str) -> str:
    """``scheme://netloc`` — netloc includes any port (crawler.py:141-144).
    Malformed URLs → '' (never equals any real domain, so the same-domain
    gate drops them instead of the parse crashing an Arrow batch)."""
    try:
        parts = urlparse(url)
    except ValueError:
        return ""
    return f"{parts.scheme}://{parts.netloc}"


def is_same_domain(url_a: str, url_b: str) -> bool:
    """Domain equality per ``extract_domain`` (crawler.py:146-148)."""
    return extract_domain(url_a) == extract_domain(url_b)


@lru_cache(maxsize=4096)
def wildcard_to_regex(pattern: str) -> str:
    """Translate a ``*`` / ``**`` / ``?`` wildcard into an anchored regex.

    ``*`` → ``[^/]*``, ``**`` → ``.*``, ``?`` → ``.``; regex metacharacters
    (except the wildcards themselves) are backslash-escaped first. The escape
    order and the late ``?`` translation replicate crawler.py:84-109 exactly.
    """
    out = pattern
    for ch in _ESCAPED_CHARS:
        out = out.replace(ch, "\\" + ch)
    out = out.replace("**", _DOUBLESTAR_TOKEN)
    out = out.replace("*", "[^/]*")
    out = out.replace(_DOUBLESTAR_TOKEN, ".*")
    out = out.replace("?", ".")
    return f"^{out}$"


def match_url_pattern(
    url: str,
    patterns: Optional[List[str]] = None,
    exclude_patterns: Optional[List[str]] = None,
) -> bool:
    """Exclusions first (any hit rejects); an empty include list accepts all;
    otherwise any include hit accepts (crawler.py:111-130)."""
    if exclude_patterns:
        for pat in exclude_patterns:
            if re.match(wildcard_to_regex(pat), url):
                return False
    if not patterns:
        return True
    for pat in patterns:
        if re.match(wildcard_to_regex(pat), url):
            return True
    return False


def url_host(url: str) -> str:
    """Bare netloc (host[:port]) — partitioning / politeness key.
    Malformed URLs → '' (one partition key for all garbage, never a crash)."""
    return safe_urlparse(url).netloc
