"""robots.txt parsing (north_rule: "crawl-delay + robots.txt rules evaluated
in vectorized pandas/Arrow UDFs").

The reference never implements robots.txt (README.md:609 merely advises it);
this engine's politeness layer consumes a ``host_rules`` dimension table
(plans/politeness.py), and THIS module produces that table from raw
robots.txt documents stored in the pages table — the Common-Crawl situation,
where robots bodies are captured alongside pages.

Parser = the RFC 9309 REP evaluated for the generic agent ``*``:
user-agent groups (consecutive ``User-agent`` lines share one group),
``Disallow``/``Allow`` rule paths (empty value = no-op), ``Crawl-delay``
seconds, ``*``/trailing-``$`` wildcards (``robots_rule_regex``), with
longest-match precedence — Allow winning length ties — applied natively in
the politeness filter (politeness.py robots_filter). Key matching is
case-insensitive; comments (``#``) and blank lines per the de-facto spec.
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def parse_robots_rules(
    text: str, agent: str = "*"
) -> Tuple[Optional[float], List[str], List[str]]:
    """→ (crawl_delay seconds or None, Disallow prefixes, Allow prefixes)
    for `agent`. Allow feeds RFC 9309 longest-match precedence in the
    politeness filter (plans/politeness.py robots_filter): the longest
    matching prefix decides, Allow winning length ties.

    Groups whose User-agent matches `agent` exactly (case-insensitive) are
    merged; if none match and `agent` != '*', the '*' groups apply.
    """
    groups: List[Tuple[List[str], List[str], List[str], Optional[float]]] = []
    cur_agents: List[str] = []
    cur_dis: List[str] = []
    cur_allow: List[str] = []
    cur_delay: Optional[float] = None
    in_directives = False

    def close_group():
        nonlocal cur_agents, cur_dis, cur_allow, cur_delay, in_directives
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_allow, cur_delay))
        cur_agents, cur_dis, cur_allow, cur_delay = [], [], [], None
        in_directives = False

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_directives:  # a new group starts after directives were seen
                close_group()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_directives = True
            if val:
                cur_dis.append(val)
        elif key == "crawl-delay":
            in_directives = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key == "allow":
            in_directives = True
            if val:  # empty Allow is a no-op, like empty Disallow
                cur_allow.append(val)
    close_group()

    agent = agent.lower()
    for want in ([agent, "*"] if agent != "*" else ["*"]):
        delay: Optional[float] = None
        dis: List[str] = []
        allow: List[str] = []
        hit = False
        for agents, d, a, cd in groups:
            if want in agents:
                hit = True
                dis.extend(d)
                allow.extend(a)
                if cd is not None:
                    delay = cd
        if hit:
            return delay, dis, allow
    return None, [], []


def parse_robots(text: str, agent: str = "*") -> Tuple[Optional[float], List[str]]:
    """→ (crawl_delay seconds or None, disallow path prefixes) for `agent` —
    the Disallow-only view of ``parse_robots_rules``."""
    delay, dis, _ = parse_robots_rules(text, agent)
    return delay, dis


def parse_sitemaps(text: str) -> List[str]:
    """``Sitemap:`` directive URLs from a robots.txt body. Per the REP these
    are GLOBAL (independent of any user-agent group), so they are collected
    from every line; order preserved, duplicates dropped."""
    out: List[str] = []
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            url = val.strip()
            if url not in out:
                out.append(url)
    return out


def entries_from_sitemap_xml(body: str) -> List[dict]:
    """``(loc, lastmod)`` pairs from a sitemap / sitemap-index document, in
    document order, first occurrence of a loc wins. ``<lastmod>`` is optional
    per the protocol and comes back None when absent; forgiving regex scan
    (real sitemaps are frequently ill-formed): EVERY ``<loc>`` in the
    document is an entry in document order — stray locs outside any
    ``<url>``/``<sitemap>`` block simply carry no lastmod."""
    import re

    def _unescape(s: str) -> str:
        return (
            s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
            .replace("&quot;", '"').replace("&apos;", "'")
        )

    # lastmod per loc, learned from well-formed blocks; the emission order
    # below comes from a full-document <loc> scan so stray locs OUTSIDE any
    # block (ill-formed documents) are never dropped — same recall as a bare
    # <loc> scrape, plus the freshness signal where a block provides it.
    block_lastmod: dict = {}
    for b in re.finditer(
        r"<(?:url|sitemap)>(.*?)</(?:url|sitemap)>", body or "", re.IGNORECASE | re.DOTALL
    ):
        chunk = b.group(1)
        locm = re.search(r"<loc>\s*([^<]+?)\s*</loc>", chunk, re.IGNORECASE)
        if not locm:
            continue
        loc = _unescape(locm.group(1))
        lm = re.search(r"<lastmod>\s*([^<]+?)\s*</lastmod>", chunk, re.IGNORECASE)
        if loc not in block_lastmod:  # first block wins, like the loc dedup
            block_lastmod[loc] = _unescape(lm.group(1)) if lm else None

    out: List[dict] = []
    seen = set()
    for m in re.finditer(r"<loc>\s*([^<]+?)\s*</loc>", body or "", re.IGNORECASE):
        loc = _unescape(m.group(1))
        if loc in seen:
            continue
        seen.add(loc)
        out.append({"loc": loc, "lastmod": block_lastmod.get(loc)})
    return out


def urls_from_sitemap_xml(body: str) -> List[str]:
    """``<loc>`` entries of a sitemap (or sitemap-index) XML document, in
    document order, entity-unescaped, deduped — the loc-only projection of
    ``entries_from_sitemap_xml`` (ONE parser; the seed set and the lastmod
    priority signal can never disagree on the same document). A full XML
    parser is deliberately avoided: real-world sitemaps are frequently
    ill-formed, and the ``<loc>`` scrape is what production crawlers (and
    Common Crawl's own tooling) do."""
    return [e["loc"] for e in entries_from_sitemap_xml(body)]


_RX_SPECIALS = set(".^$+?()[]{}|\\")


def robots_rule_regex(rule: str) -> str:
    """RFC 9309 rule path → anchored Java/RE2-safe regex: ``*`` matches any
    run of characters, a TRAILING ``$`` anchors the end of the URL, every
    other character is literal (a mid-rule ``$`` too). Plain prefixes come
    out as ``^literal`` — identical semantics to startswith."""
    end_anchor = rule.endswith("$")
    body = rule[:-1] if end_anchor else rule
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RX_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if end_anchor:
        out.append("$")
    return "".join(out)


def is_wildcard_rule(rule: str) -> bool:
    """True when the rule needs regex evaluation (contains ``*`` or a
    trailing ``$``); plain prefixes match via cheap startswith."""
    return "*" in rule or rule.endswith("$")


def robots_rules_structs(rules: List[str]) -> List[dict]:
    """Rule paths → [(rx, n)] structs for the wildcard-aware politeness
    filter: ``rx`` the anchored regex, ``n`` the RFC 9309 precedence length
    in OCTETS (utf-8 byte count — most-octets rule wins, Allow breaking
    ties; the literal-prefix side measures ``octet_length()`` so both rule
    families share the RFC's scale)."""
    return [{"rx": robots_rule_regex(r), "n": len(r.encode("utf-8"))} for r in rules]
