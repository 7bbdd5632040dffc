"""Selector-based extraction (SURVEY §2 O-42..O-47) on the stdlib only.

The reference's SelectorExtractor (/root/reference/selector_utils.py) runs on
BeautifulSoup + lxml; neither ships in this environment, so this module
implements a small DOM + a CSS/XPath SUBSET engine on ``html.parser`` that
covers every selector the reference's five templates use (tag, ``.class``,
``#id``, ``[attr=value]`` compounds; descendant and ``>`` combinators;
``//tag``, ``//tag[@attr='v']``, ``//tag[contains(@attr, 'v')]``), with the
reference's exact composition semantics:

* extract_by_css (selector_utils.py:56-108): selectors applied in order,
  invalid ones skipped; an extracted element is DROPPED when a descendant
  matches an exclude selector, or when the element itself matches one within
  its parent's scope; text via get_text(separator=' ', strip=True)
  equivalent (per-string strip, blank strings skipped, joined by ' ');
  parts joined by blank lines.
* extract_by_xpath (selector_utils.py:110-165): expressions in order,
  invalid skipped; exclusion removes identical element objects; text via
  lxml ``itertext`` equivalent (verbatim text nodes joined by ' ', then one
  outer strip).
* extract_combined (selector_utils.py:167-212): css part + xpath part,
  deduplicated by the whitespace-normalized lowercase 100-char prefix.
* validate_* (selector_utils.py:214-248): parse probe on dummy HTML.
* the five literal selector templates (selector_utils.py:21-54).

Known deviation (documented, not observable with the template selectors):
element equality here is OBJECT identity, while bs4 Tag equality is
structural — the reference's ``list.remove`` could drop a different but
structurally-identical element.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, Iterator, List, Optional, Tuple

VOID_TAGS = frozenset(
    ["area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"]
)

SELECTOR_TEMPLATES: Dict[str, Dict[str, List[str]]] = {
    # Verbatim template DATA from selector_utils.py:21-54 (the selector
    # strings are the behavioral contract).
    "blog": {
        "css": ["article", ".post-content", ".entry-content", "main article", ".blog-post"],
        "xpath": ["//article", '//div[@class="post-content"]', '//div[contains(@class, "entry-content")]'],
        "exclude_css": [".comments", ".sidebar", ".related-posts", ".share-buttons"],
        "exclude_xpath": ['//div[@class="comments"]', "//aside", '//div[contains(@class, "related")]'],
    },
    "news": {
        "css": [".article-body", ".story-content", ".news-content", "article.main-content"],
        "xpath": ['//div[@class="article-body"]', '//div[contains(@class, "story-content")]'],
        "exclude_css": [".advertisement", ".newsletter-signup", ".trending"],
        "exclude_xpath": ['//div[contains(@class, "ad")]', '//div[@class="newsletter"]'],
    },
    "documentation": {
        "css": [".markdown-body", ".doc-content", ".documentation", "article.content"],
        "xpath": ['//div[@class="markdown-body"]', '//section[@class="content"]'],
        "exclude_css": [".toc", ".nav-sidebar", ".footer-nav"],
        "exclude_xpath": ["//nav", '//div[@class="table-of-contents"]'],
    },
    "ecommerce": {
        "css": [".product-description", ".product-details", ".item-description"],
        "xpath": ['//div[@class="product-description"]', '//section[contains(@class, "product-info")]'],
        "exclude_css": [".reviews", ".recommendations", ".recently-viewed"],
        "exclude_xpath": ['//div[@class="reviews"]', '//div[contains(@class, "recommended")]'],
    },
    "forum": {
        "css": [".post-body", ".message-content", ".forum-post", ".comment-body"],
        "xpath": ['//div[@class="post-body"]', '//div[contains(@class, "message")]'],
        "exclude_css": [".signature", ".user-info", ".post-meta"],
        "exclude_xpath": ['//div[@class="signature"]', '//div[@class="user-profile"]'],
    },
}


# ---------------------------------------------------------------------------
# Tiny DOM
# ---------------------------------------------------------------------------

class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Optional[dict] = None, parent: "Optional[Node]" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node | str
        self.parent = parent

    @property
    def classes(self) -> List[str]:
        return (self.attrs.get("class") or "").split()

    def iter_nodes(self) -> Iterator["Node"]:
        """Descendants in document order (self excluded)."""
        for child in self.children:
            if isinstance(child, Node):
                yield child
                yield from child.iter_nodes()

    def iter_text(self) -> Iterator[str]:
        for child in self.children:
            if isinstance(child, Node):
                yield from child.iter_text()
            else:
                yield child

    def get_text(self, separator: str = " ", strip: bool = True) -> str:
        if strip:
            parts = [t for t in (s.strip() for s in self.iter_text()) if t]
        else:
            parts = list(self.iter_text())
        return separator.join(parts)

    def itertext_join(self) -> str:
        """lxml ``' '.join(el.itertext()).strip()`` equivalent."""
        return " ".join(self.iter_text()).strip()

    def __repr__(self) -> str:  # debugging aid only
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self._stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._stack[-1].children.append(Node(tag, dict(attrs), self._stack[-1]))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray end tag: ignored (html.parser tolerance)

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)


def parse_dom(html: str) -> Node:
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        pass  # malformed html: keep the partial tree
    return builder.root


# ---------------------------------------------------------------------------
# CSS subset
# ---------------------------------------------------------------------------

_COMPOUND_RX = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[\w-]+=(?:\"[^\"]*\"|'[^']*'|[^\]]*)\])*)$"
)
_PART_RX = re.compile(r"[.#][\w-]+|\[[\w-]+=(?:\"[^\"]*\"|'[^']*'|[^\]]*)\]")


class _Compound:
    def __init__(self, token: str):
        m = _COMPOUND_RX.match(token)
        if not m or (not m.group("tag") and not m.group("rest")):
            raise ValueError(f"unsupported CSS compound: {token!r}")
        self.tag = (m.group("tag") or "").lower()
        self.classes: List[str] = []
        self.id: Optional[str] = None
        self.attrs: List[Tuple[str, str]] = []
        for part in _PART_RX.findall(m.group("rest") or ""):
            if part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("#"):
                self.id = part[1:]
            else:
                name, _, value = part[1:-1].partition("=")
                self.attrs.append((name, value.strip("\"'")))

    def matches(self, node: Node) -> bool:
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        classes = node.classes
        for cls in self.classes:
            if cls not in classes:
                return False
        for name, value in self.attrs:
            if node.attrs.get(name) != value:
                return False
        return True


class CssSelector:
    """One complex selector: compounds joined by descendant/child combinators.
    Comma groups are handled by ``select``."""

    def __init__(self, selector: str):
        tokens = selector.replace(">", " > ").split()
        if not tokens or tokens[0] == ">" or tokens[-1] == ">":
            raise ValueError(f"unsupported CSS selector: {selector!r}")
        self.steps: List[Tuple[str, _Compound]] = []  # (combinator, compound)
        comb = " "
        for tok in tokens:
            if tok == ">":
                if comb == ">":
                    raise ValueError(f"unsupported CSS selector: {selector!r}")
                comb = ">"
                continue
            self.steps.append((comb, _Compound(tok)))
            comb = " "

    def matches(self, node: Node) -> bool:
        comb, last = self.steps[-1]
        if not last.matches(node):
            return False
        return self._match_ancestors(node, len(self.steps) - 2, comb)

    def _match_ancestors(self, node: Node, idx: int, comb_to_right: str) -> bool:
        if idx < 0:
            return True
        comb, compound = self.steps[idx]
        parent = node.parent
        if comb_to_right == ">":
            if parent is None or parent.tag == "[document]":
                return False
            return compound.matches(parent) and self._match_ancestors(parent, idx - 1, comb)
        while parent is not None and parent.tag != "[document]":
            if compound.matches(parent) and self._match_ancestors(parent, idx - 1, comb):
                return True
            parent = parent.parent
        return False


def css_select(scope: Node, selector: str) -> List[Node]:
    """All descendants of ``scope`` matching ``selector`` (comma groups OK),
    in document order — bs4 ``Tag.select`` semantics for the subset."""
    groups = [CssSelector(part.strip()) for part in selector.split(",") if part.strip()]
    if not groups:
        raise ValueError("empty selector")
    return [node for node in scope.iter_nodes() if any(g.matches(node) for g in groups)]


# ---------------------------------------------------------------------------
# XPath subset
# ---------------------------------------------------------------------------

_XPATH_RX = re.compile(
    r"^//(?P<tag>[a-zA-Z][\w-]*)"
    r"(?:\[(?:@(?P<attr>[\w-]+)=(?P<q>[\"'])(?P<val>.*?)(?P=q)"
    r"|contains\(@(?P<cattr>[\w-]+),\s*(?P<cq>[\"'])(?P<cval>.*?)(?P=cq)\))\])?$"
)


def xpath_select(scope: Node, expr: str) -> List[Node]:
    m = _XPATH_RX.match(expr.strip())
    if not m:
        raise ValueError(f"unsupported XPath: {expr!r}")
    tag = m.group("tag").lower()
    out = []
    for node in scope.iter_nodes():
        if node.tag != tag:
            continue
        if m.group("attr") is not None:
            if node.attrs.get(m.group("attr")) != m.group("val"):
                continue
        elif m.group("cattr") is not None:
            if m.group("cval") not in (node.attrs.get(m.group("cattr")) or ""):
                continue
        out.append(node)
    return out


# ---------------------------------------------------------------------------
# Extraction (O-42/O-43/O-44) — reference composition semantics
# ---------------------------------------------------------------------------

def extract_by_css(html: str, selectors: List[str],
                   exclude_selectors: Optional[List[str]] = None) -> str:
    """≙ SelectorExtractor.extract_by_css (selector_utils.py:56-108)."""
    if not html or not selectors:
        return ""
    root = parse_dom(html)
    extracted: List[Node] = []
    for selector in selectors:
        try:
            extracted.extend(css_select(root, selector))
        except Exception:
            continue  # invalid selector, skip
    if exclude_selectors:
        for element in extracted[:]:
            for exclude in exclude_selectors:
                try:
                    # descendant matches the exclusion → drop (bs4 select_one
                    # searches descendants only)
                    if css_select(element, exclude):
                        extracted.remove(element)
                        break
                    # the element ITSELF matches, probed via the parent scope
                    parent = element.parent
                    if parent is not None and element in css_select(parent, exclude):
                        extracted.remove(element)
                        break
                except Exception:
                    continue
    parts = []
    for element in extracted:
        text = element.get_text(separator=" ", strip=True)
        if text:
            parts.append(text)
    return "\n\n".join(parts)


def extract_by_xpath(html: str, xpath_expressions: List[str],
                     exclude_xpath: Optional[List[str]] = None) -> str:
    """≙ SelectorExtractor.extract_by_xpath (selector_utils.py:110-165)."""
    if not html or not xpath_expressions:
        return ""
    root = parse_dom(html)
    extracted: List[Node] = []
    for expr in xpath_expressions:
        try:
            extracted.extend(xpath_select(root, expr))
        except Exception:
            continue
    for exclude in exclude_xpath or []:
        try:
            for element in xpath_select(root, exclude):
                if element in extracted:
                    extracted.remove(element)
        except Exception:
            continue
    parts = []
    for element in extracted:
        text = element.itertext_join()
        if text:
            parts.append(text)
    return "\n\n".join(parts)


def extract_combined(html: str,
                     css_selectors: Optional[List[str]] = None,
                     xpath_expressions: Optional[List[str]] = None,
                     exclude_css: Optional[List[str]] = None,
                     exclude_xpath: Optional[List[str]] = None) -> str:
    """≙ SelectorExtractor.extract_combined (selector_utils.py:167-212):
    css part + xpath part, deduped by the normalized 100-char prefix (O-31)."""
    parts = []
    if css_selectors:
        css_content = extract_by_css(html, css_selectors, exclude_css)
        if css_content:
            parts.append(css_content)
    if xpath_expressions:
        xpath_content = extract_by_xpath(html, xpath_expressions, exclude_xpath)
        if xpath_content:
            parts.append(xpath_content)
    if len(parts) > 1:
        unique, seen = [], set()
        for part in parts:
            normalized = re.sub(r"\s+", " ", part.lower()[:100])
            if normalized not in seen:
                seen.add(normalized)
                unique.append(part)
        return "\n\n".join(unique)
    return "\n\n".join(parts)


def validate_css_selector(selector: str) -> Tuple[bool, Optional[str]]:
    """≙ selector_utils.py:214-231 (probe on dummy HTML)."""
    try:
        css_select(parse_dom("<div></div>"), selector)
        return True, None
    except Exception as exc:
        return False, str(exc)


def validate_xpath(xpath: str) -> Tuple[bool, Optional[str]]:
    """≙ selector_utils.py:233-248."""
    try:
        xpath_select(parse_dom("<div></div>"), xpath)
        return True, None
    except Exception as exc:
        return False, str(exc)


def get_template(template_name: str) -> Optional[Dict[str, List[str]]]:
    return SELECTOR_TEMPLATES.get(template_name)


def extract_with_template(html: str, template_name: str) -> str:
    """Template-driven combined extraction (ConfigurableContentCleaner
    set_selector_template + extract_with_selectors, content_filters.py:467-479
    and 427-443)."""
    template = get_template(template_name)
    if not template:
        return ""
    return extract_combined(
        html,
        css_selectors=template.get("css"),
        xpath_expressions=template.get("xpath"),
        exclude_css=template.get("exclude_css"),
        exclude_xpath=template.get("exclude_xpath"),
    )
