"""Selector-based extraction (SURVEY §2 O-42..O-47) on the stdlib only.

The reference's SelectorExtractor (/root/reference/selector_utils.py) runs on
BeautifulSoup + lxml; neither ships in this environment, so this module
implements a small DOM + a CSS/XPath SUBSET engine on ``html.parser`` that
covers every selector the reference's five templates use and the general
forms a user would pass through ``soup.select()`` / lxml:

* CSS compounds: tag, ``*``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=v]`` ``[attr^=v]`` ``[attr$=v]`` ``[attr*=v]`` ``[attr~=v]``
  ``[attr|=v]``, CSS4 case flags ``[attr=v i]`` / ``[attr=v s]``,
  pseudo-classes ``:first-child`` ``:last-child``
  ``:only-child`` ``:empty`` (no children at all — any text node, even
  whitespace, disqualifies) ``:root`` (parent is the document node)
  ``:nth-child(an+b|odd|even|N [of S])`` ``:nth-last-child(… [of S])``
  (CSS4 ``of S``: index counted among siblings matching the selector
  list S),
  of-type variants ``:first-of-type`` ``:last-of-type`` ``:only-of-type``
  ``:nth-of-type(…)`` ``:nth-last-of-type(…)``, ``:not(selector list)``
  with full COMPLEX selector arguments (combinators allowed; the subject is
  the rightmost compound — leading/relative combinators stay invalid, CSS
  reserves those for :has()), ``:is()`` / ``:where()`` (+ the legacy
  ``:matches()`` alias, all soupsieve-supported) with the same
  complex-selector argument grammar (matches when ANY argument matches),
  soupsieve's ``:-soup-contains("s"[, …])`` / ``:-soup-contains-own`` (+
  the deprecated ``:contains`` alias; case-sensitive, ANY-of over the
  full descendant text / own text nodes), and
  ``:has(relative selector[, …])`` with soupsieve semantics (arguments may
  lead with ``>`` / ``+`` / ``~``, anchored at the subject element);
  combinators: descendant, ``>``, ``+``, ``~``; comma groups.
* XPath: absolute multi-step paths (``//a//b``, ``/a/b``, ``*``),
  predicates ``[@attr='v']`` ``[@attr]`` ``[contains(@attr,'v')]``
  ``[contains(text(),'v')]`` ``[starts-with(@attr,'v')]``
  ``[starts-with(text(),'v')]`` ``[text()='v']`` ``[N]`` ``[last()]``
  ``[position() OP N]``, ``!=`` forms ``[@attr!='v']`` / ``[text()!='v']``
  (node-set semantics: an absent attribute never matches ``!=``),
  ``[normalize-space()='v']`` / ``[normalize-space(text())='v']`` /
  ``[normalize-space(@a)='v']`` (and ``!=``),
  ``[string-length(ARG) OP N]``, ``[count(tag|*|text()) OP N]``
  with OP ∈ ``= != < <= > >=``, ``contains``/``starts-with`` over a
  ``normalize-space()`` inner call, existence tests ``[tag]`` / ``[*]``
  (child element) / ``[text()]`` (text-node child) / ``[@*]`` (any
  attribute), ``not(...)`` around any scalar predicate, and — round-5 —
  positional forms inside ``not()`` with exact XPath 1.0 boolean
  conversion: ``[not(position() OP N)]`` filters positionally (inverted,
  same per-group/axis position context), while ``[not(3)]`` and
  ``[not(last())]`` are constant FALSE (the bare-number
  position()-equality rule applies only to NUMBER-valued predicates;
  ``not()`` boolean()-converts its argument first, and boolean(3) /
  boolean(last()) are always true — lxml agrees); explicit axes
  ``following-sibling::``
  ``preceding-sibling::`` ``parent::`` ``ancestor(-or-self)::``
  ``self::`` ``descendant(-or-self)::`` ``following::`` ``preceding::``
  (positional predicates count in axis order per context node,
  reverse-axis aware); top-level union ``a | b`` (document-order merged
  node-set); trailing ``text()`` steps; trailing attribute steps
  ``@name`` / ``@*`` / ``attribute::name`` yielding attribute-value
  strings — which the extraction layer then drops exactly like the
  reference (lxml smart strings have no ``itertext``; the AttributeError
  is swallowed, selector_utils.py:158-165), so ``//a/@href | //p`` keeps
  only the ``//p`` text in both engines.

Anything outside the subset raises at parse time and is SKIPPED by the
extraction layer — the reference's invalid-selector semantics. Composition
matches the reference exactly:

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

Equality semantics match the per-engine reference exactly: the CSS exclusion
path removes under bs4 STRUCTURAL equality (``_struct_eq`` — tag, attrs,
contents recursively; ``list.remove`` drops the FIRST structurally-equal
element, and the ``element in parent.select(...)`` membership probe also
tests structurally — so an exclusion matching ONE of two identical twins
cascades to remove BOTH), while the XPath path removes by object identity —
lxml's default ``_Element`` equality — so only the matched node goes, and a
descendant-matching exclusion removes nothing at all. These mechanics
produce OBSERVABLY different output between the two engines on twin-bearing
documents (e.g. CSS keeps only "tail" where XPath keeps "dup\n\ntail");
tests/test_selectors.py ``TestExclusionDivergenceMatrix`` pins our engine
to diverge exactly where the reference's two paths do
(selector_utils.py:84-99 vs 148-152).
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
# CSS subset — tag / .class / #id / [attr(op)value] / pseudo-classes,
# combinators: descendant, >, +, ~
# ---------------------------------------------------------------------------

_ATTR_PART = r"\[[\w-]+(?:[~^$*|]?=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?(?:\s+[iIsS])?\]"
# one nesting level of parens so :not(:nth-child(2n+1)) tokenizes whole
_PSEUDO_PART = r":[\w-]+(?:\((?:[^()]|\([^()]*\))*\))?"
_COMPOUND_RX = re.compile(
    rf"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    rf"(?P<rest>(?:[.#][\w-]+|{_ATTR_PART}|{_PSEUDO_PART})*)$"
)
_PART_RX = re.compile(rf"[.#][\w-]+|{_ATTR_PART}|{_PSEUDO_PART}")
_NTH_RX = re.compile(r"^\s*(?:(odd|even)|(?:(?P<a>[+-]?\d*)n\s*(?P<b>[+-]\s*\d+)?)|(?P<n>[+-]?\d+))\s*$")


def _parse_nth(arg: str) -> Tuple[int, int]:
    """an+b coefficients for :nth-child(); odd=2n+1, even=2n."""
    m = _NTH_RX.match(arg)
    if not m:
        raise ValueError(f"unsupported nth-child argument: {arg!r}")
    if m.group(1) == "odd":
        return 2, 1
    if m.group(1) == "even":
        return 2, 0
    if m.group("n") is not None:
        return 0, int(m.group("n"))
    a_raw = m.group("a")
    a = 1 if a_raw in ("", "+") else (-1 if a_raw == "-" else int(a_raw))
    b = int(m.group("b").replace(" ", "")) if m.group("b") else 0
    return a, b


def _nth_matches(a: int, b: int, pos: int) -> bool:
    """True iff pos = a·n + b for some integer n ≥ 0."""
    if a == 0:
        return pos == b
    n, rem = divmod(pos - b, a)
    return rem == 0 and n >= 0


def _element_siblings(node: Node) -> List[Node]:
    if node.parent is None:
        return [node]
    return [c for c in node.parent.children if isinstance(c, Node)]


class _Compound:
    def __init__(self, token: str):
        m = _COMPOUND_RX.match(token)
        if not m or (not m.group("tag") and not m.group("rest")):
            # Name the reason for the one syntactically-valid CSS family we
            # deliberately don't implement: namespace prefixes (``ns|E``,
            # ``*|E``, ``|E`` — soupsieve parses them; the reference's HTML
            # documents never carry namespaces, selector_utils.py:56-108).
            # A ``|`` outside brackets that isn't the ``|=`` attr operator
            # is namespace syntax. Either way it raises → invalid-skip,
            # the reference's semantics for unsupported selectors.
            bracket_free = re.sub(r"\[[^\]]*\]", "", token)
            if "|" in bracket_free:
                raise ValueError(
                    f"CSS namespace syntax is unsupported (ns|E): {token!r}")
            raise ValueError(f"unsupported CSS compound: {token!r}")
        self.tag = (m.group("tag") or "").lower()
        self.classes: List[str] = []
        self.id: Optional[str] = None
        # (name, op, value, ci) — ci True for the CSS4 case-insensitive flag
        self.attrs: List[Tuple[str, str, Optional[str], bool]] = []
        self.pseudos: List[Tuple] = []
        for part in _PART_RX.findall(m.group("rest") or ""):
            if part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("#"):
                self.id = part[1:]
            elif part.startswith("["):
                body = part[1:-1]
                am = re.match(r"^([\w-]+)(?:([~^$*|]?=)(.*))?$", body)
                if am is None:
                    raise ValueError(f"unsupported attribute selector: {part!r}")
                name, op, value = am.group(1), am.group(2), am.group(3)
                if op is None:
                    self.attrs.append((name, "", None, False))  # bare presence
                else:
                    # CSS4 case flag: [attr=v i] (insensitive) / [attr=v s]
                    # (explicit sensitive, the default) after the value
                    ci = False
                    fm = re.match(
                        r"^(\"[^\"]*\"|'[^']*'|\S*?)\s+([iIsS])$", value or ""
                    )
                    if fm:
                        value, ci = fm.group(1), fm.group(2) in ("i", "I")
                    self.attrs.append((name, op, (value or "").strip("\"'"), ci))
            else:  # pseudo-class
                name, _, arg = part[1:].partition("(")
                name = name.lower()
                if name in ("first-child", "last-child", "only-child",
                            "first-of-type", "last-of-type", "only-of-type",
                            "empty", "root"):
                    self.pseudos.append((name,))
                elif name in ("nth-child", "nth-last-child",
                              "nth-of-type", "nth-last-of-type") and arg:
                    body = arg[:-1] if arg.endswith(")") else arg
                    # CSS4 `An+B of S` (nth-child family only): the index
                    # counts among siblings MATCHING the selector list S
                    of_list = None
                    low = body.lower()
                    if name in ("nth-child", "nth-last-child") and " of " in low:
                        cut = low.index(" of ")
                        nth_part, of_part = body[:cut], body[cut + 4:]
                        of_list = []
                        for s in _split_top_level(of_part, ","):
                            s = s.strip()
                            if not s:
                                continue
                            if len(_tokenize_selector(s)) > 1:
                                of_list.append(CssSelector(s))
                            else:
                                of_list.append(_Compound(s))
                        if not of_list:
                            raise ValueError(f"empty 'of' list: {part!r}")
                        body = nth_part
                    a, b = _parse_nth(body.strip())
                    self.pseudos.append((name, a, b, of_list))
                elif name == "not" and arg:
                    # CSS4 :not(selector list) — arguments are full COMPLEX
                    # selectors (combinators allowed, soupsieve semantics:
                    # the subject is the rightmost compound and the chain to
                    # its left must be satisfiable in the real DOM); a failed
                    # inner parse propagates and the whole selector is
                    # skipped as invalid. Leading combinators (relative
                    # selectors) stay invalid — CSS only allows those in
                    # :has().
                    body = arg[:-1] if arg.endswith(")") else arg  # ONE paren:
                    # rstrip would eat the closer of a nested :nth-child(2)
                    inner: List = []
                    for s in _split_top_level(body, ","):
                        s = s.strip()
                        if not s:
                            continue
                        if len(_tokenize_selector(s)) > 1:  # has combinators
                            inner.append(CssSelector(s))
                        else:
                            inner.append(_Compound(s))
                    if not inner:
                        raise ValueError(f"empty :not() argument: {part!r}")
                    self.pseudos.append(("not", inner))
                elif name in ("-soup-contains", "-soup-contains-own",
                              "contains") and arg:
                    # soupsieve's scraping staple: matches when the element's
                    # text contains ANY of the argument strings —
                    # :-soup-contains over the full descendant text (bs4
                    # Tag.text), :-soup-contains-own over the element's own
                    # text nodes; ``:contains()`` is the deprecated alias.
                    # Case-sensitive, like soupsieve's default.
                    body = arg[:-1] if arg.endswith(")") else arg
                    needles = []
                    for s in _split_top_level(body, ","):
                        s = s.strip()
                        if len(s) >= 2 and s[0] in "\"'" and s[-1] == s[0]:
                            s = s[1:-1]
                        if s:
                            needles.append(s)
                    if not needles:
                        raise ValueError(f"empty :{name}() argument: {part!r}")
                    self.pseudos.append(
                        ("soup-contains", name.endswith("-own"), needles)
                    )
                elif name in ("is", "where", "matches") and arg:
                    # CSS4 :is()/:where() (and the legacy :matches() alias,
                    # all soupsieve-supported): matches when ANY argument
                    # matches — the dual of :not(); same complex-selector
                    # argument grammar, same specificity-free matching
                    # (specificity never matters for select()).
                    body = arg[:-1] if arg.endswith(")") else arg
                    inner = []
                    for s in _split_top_level(body, ","):
                        s = s.strip()
                        if not s:
                            continue
                        if len(_tokenize_selector(s)) > 1:
                            inner.append(CssSelector(s))
                        else:
                            inner.append(_Compound(s))
                    if not inner:
                        raise ValueError(f"empty :{name}() argument: {part!r}")
                    self.pseudos.append(("is", inner))
                elif name == "has" and arg:
                    # CSS4 :has(relative selector list) — soupsieve semantics:
                    # each argument may lead with > / + / ~ (descendant when
                    # bare) and is anchored at the subject element; the subject
                    # matches when ANY argument finds at least one node.
                    body = arg[:-1] if arg.endswith(")") else arg
                    groups = []
                    for s in _split_top_level(body, ","):
                        s = s.strip()
                        if not s:
                            continue
                        lead = " "
                        if s[0] in ">+~":
                            lead, s = s[0], s[1:].strip()
                        steps: List[Tuple[str, "_Compound"]] = []
                        comb, pending = lead, True
                        for tok in _tokenize_selector(s):
                            if tok in (">", "+", "~"):
                                if not steps:
                                    raise ValueError(
                                        f"unsupported :has() argument: {part!r}"
                                    )
                                comb, pending = tok, True
                                continue
                            steps.append((comb, _Compound(tok)))
                            comb, pending = " ", False
                        if pending and steps or not steps:
                            raise ValueError(f"unsupported :has() argument: {part!r}")
                        groups.append(steps)
                    if not groups:
                        raise ValueError(f"empty :has() argument: {part!r}")
                    self.pseudos.append(("has", groups))
                else:
                    raise ValueError(f"unsupported pseudo-class: :{part[1:]}")

    @staticmethod
    def _relative_nonempty(anchor: Node, steps) -> bool:
        """True iff walking ``steps`` (combinator, compound) from ``anchor``
        reaches at least one node — the :has() existence test."""
        frontier = [anchor]
        for comb, compound in steps:
            nxt: List[Node] = []
            seen = set()
            for n in frontier:
                if comb == " ":
                    cands = [d for d in n.iter_nodes() if d is not n]
                elif comb == ">":
                    cands = [c for c in n.children if isinstance(c, Node)]
                else:
                    sibs = _element_siblings(n)
                    pos = next(i for i, s in enumerate(sibs) if s is n)
                    if comb == "+":
                        cands = sibs[pos + 1:pos + 2]
                    else:  # ~
                        cands = sibs[pos + 1:]
                for c in cands:
                    if id(c) not in seen and compound.matches(c):
                        seen.add(id(c))
                        nxt.append(c)
            if not nxt:
                return False
            frontier = nxt
        return True

    @staticmethod
    def _attr_match(
        op: str, actual: Optional[str], value: Optional[str], ci: bool = False
    ) -> bool:
        if op == "":
            return actual is not None
        if actual is None:
            return False
        if ci:
            actual = actual.lower()
            value = value.lower() if value is not None else value
        if op == "=":
            return actual == value
        if not value:  # per spec ^= $= *= with empty value match nothing
            return False
        if op == "^=":
            return actual.startswith(value)
        if op == "$=":
            return actual.endswith(value)
        if op == "*=":
            return value in actual
        if op == "~=":
            return value in actual.split()
        if op == "|=":
            return actual == value or actual.startswith(value + "-")
        return False

    def matches(self, node: Node) -> bool:
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        classes = node.classes
        for cls in self.classes:
            if cls not in classes:
                return False
        for name, op, value, ci in self.attrs:
            if not self._attr_match(op, node.attrs.get(name), value, ci):
                return False
        for pseudo in self.pseudos:
            kind = pseudo[0]
            if kind == "not":
                if any(c.matches(node) for c in pseudo[1]):
                    return False
                continue
            if kind == "is":
                if not any(c.matches(node) for c in pseudo[1]):
                    return False
                continue
            if kind == "empty":
                # CSS :empty — no children at all; ANY text node (even
                # whitespace) disqualifies, per Selectors L4 / soupsieve
                if node.children:
                    return False
                continue
            if kind == "soup-contains":
                text = (_node_own_text(node) if pseudo[1]
                        else _node_string_value(node))
                if not any(n in text for n in pseudo[2]):
                    return False
                continue
            if kind == "root":
                parent = node.parent
                if parent is None or parent.tag != "[document]":
                    return False
                continue
            if kind == "has":
                if not any(
                    self._relative_nonempty(node, steps) for steps in pseudo[1]
                ):
                    return False
                continue
            sibs = _element_siblings(node)
            if kind.endswith("of-type"):
                # of-type variants index within same-tag siblings only
                sibs = [s for s in sibs if s.tag == node.tag]
            elif (kind in ("nth-child", "nth-last-child")
                  and len(pseudo) > 3 and pseudo[3]):
                # `An+B of S`: index among siblings matching S; a subject
                # not matching S itself can never match
                sibs = [s for s in sibs
                        if any(c.matches(s) for c in pseudo[3])]
                if not any(s is node for s in sibs):
                    return False
            idx = next(i for i, s in enumerate(sibs) if s is node)
            if kind in ("first-child", "first-of-type"):
                if idx != 0:
                    return False
            elif kind in ("last-child", "last-of-type"):
                if idx != len(sibs) - 1:
                    return False
            elif kind in ("only-child", "only-of-type"):
                if len(sibs) != 1:
                    return False
            elif kind in ("nth-child", "nth-of-type"):
                if not _nth_matches(pseudo[1], pseudo[2], idx + 1):
                    return False
            elif kind in ("nth-last-child", "nth-last-of-type"):
                if not _nth_matches(pseudo[1], pseudo[2], len(sibs) - idx):
                    return False
        return True


def _tokenize_selector(selector: str) -> List[str]:
    """Split a complex selector into compound tokens and combinator tokens,
    respecting brackets, parens and quotes (so ``[attr~=v]`` or
    ``:nth-child(2n+1)`` never split)."""
    tokens: List[str] = []
    buf: List[str] = []
    depth = 0
    quote: Optional[str] = None
    for ch in selector:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch in ">+~ ":
            if buf:
                tokens.append("".join(buf))
                buf = []
            if ch != " ":
                tokens.append(ch)
        else:
            buf.append(ch)
    if quote or depth != 0:
        raise ValueError(f"unbalanced selector: {selector!r}")
    if buf:
        tokens.append("".join(buf))
    return tokens


class CssSelector:
    """One complex selector: compounds joined by descendant / ``>`` / ``+`` /
    ``~`` combinators. Comma groups are handled by ``select``."""

    def __init__(self, selector: str):
        tokens = _tokenize_selector(selector)
        if not tokens:
            raise ValueError(f"empty CSS selector: {selector!r}")
        self.steps: List[Tuple[str, _Compound]] = []  # (combinator-to-left, compound)
        comb = " "
        pending = False  # a combinator awaits its right-hand compound
        for tok in tokens:
            if tok in (">", "+", "~"):
                if pending or not self.steps:  # doubled or leading combinator
                    raise ValueError(f"unsupported CSS selector: {selector!r}")
                comb = tok
                pending = True
                continue
            self.steps.append((comb, _Compound(tok)))
            comb = " "
            pending = False
        if pending or not self.steps:  # trailing combinator or nothing at all
            raise ValueError(f"unsupported CSS selector: {selector!r}")

    def matches(self, node: Node) -> bool:
        comb, last = self.steps[-1]
        if not last.matches(node):
            return False
        return self._match_left(node, len(self.steps) - 2, comb)

    def _match_left(self, node: Node, idx: int, comb_to_right: str) -> bool:
        """Match steps[idx] (and leftwards) against the node reachable from
        ``node`` via ``comb_to_right``."""
        if idx < 0:
            return True
        comb, compound = self.steps[idx]
        if comb_to_right == ">":
            parent = node.parent
            if parent is None or parent.tag == "[document]":
                return False
            return compound.matches(parent) and self._match_left(parent, idx - 1, comb)
        if comb_to_right in ("+", "~"):
            sibs = _element_siblings(node)
            pos = next(i for i, s in enumerate(sibs) if s is node)
            if comb_to_right == "+":
                if pos == 0:
                    return False
                prev = sibs[pos - 1]
                return compound.matches(prev) and self._match_left(prev, idx - 1, comb)
            for prev in sibs[:pos]:
                if compound.matches(prev) and self._match_left(prev, idx - 1, comb):
                    return True
            return False
        parent = node.parent
        while parent is not None and parent.tag != "[document]":
            if compound.matches(parent) and self._match_left(parent, idx - 1, comb):
                return True
            parent = parent.parent
        return False


def _split_top_level(s: str, sep: str) -> List[str]:
    """Split on ``sep`` outside brackets/parens/quotes (so a comma inside
    ``:not(a, b)`` or a ``|`` inside ``[attr|=v]`` never splits)."""
    parts: List[str] = []
    buf: List[str] = []
    depth = 0
    quote: Optional[str] = None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch == sep:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def css_select(scope: Node, selector: str) -> List[Node]:
    """All descendants of ``scope`` matching ``selector`` (comma groups OK),
    in document order — bs4 ``Tag.select`` semantics for the subset."""
    groups = [CssSelector(part.strip())
              for part in _split_top_level(selector, ",") if part.strip()]
    if not groups:
        raise ValueError("empty selector")
    return [node for node in scope.iter_nodes() if any(g.matches(node) for g in groups)]


# ---------------------------------------------------------------------------
# XPath subset — multi-step absolute paths (``//a//b``, ``/a/b``), predicates
# ``[@attr='v']`` ``[@attr]`` ``[contains(@attr,'v')]`` ``[contains(text(),'v')]``
# ``[text()='v']`` ``[N]`` ``[last()]`` ``[position() OP N]``, trailing
# ``text()`` steps (which the extraction layer skips, like the reference's
# lxml smart-string AttributeError path).
# ---------------------------------------------------------------------------

_PRED_ATTR_EQ = re.compile(r"^@([\w-]+)\s*=\s*([\"'])(.*?)\2$")
_PRED_ATTR = re.compile(r"^@([\w-]+)$")
_PRED_CONTAINS_ATTR = re.compile(r"^contains\(\s*@([\w-]+)\s*,\s*([\"'])(.*?)\2\s*\)$")
_PRED_CONTAINS_TEXT = re.compile(r"^contains\(\s*text\(\)\s*,\s*([\"'])(.*?)\1\s*\)$")
_PRED_STARTS_ATTR = re.compile(r"^starts-with\(\s*@([\w-]+)\s*,\s*([\"'])(.*?)\2\s*\)$")
_PRED_STARTS_TEXT = re.compile(r"^starts-with\(\s*text\(\)\s*,\s*([\"'])(.*?)\1\s*\)$")
_PRED_TEXT_EQ = re.compile(r"^text\(\)\s*=\s*([\"'])(.*?)\1$")
_PRED_POS_N = re.compile(r"^(\d+)$")
_PRED_POS_LAST = re.compile(r"^last\(\)$")
_PRED_POS_CMP = re.compile(r"^position\(\)\s*(!=|<=|>=|<|>|=)\s*(\d+)$")
# -- round-5 widening: positional forms inside not() (VERDICT r4 #5) --
# XPath 1.0 semantics are asymmetric here: a BARE number predicate [3] is
# position()=3 only because the predicate value is a *number*; inside
# not(...) the argument is converted with boolean() first, so not(3) is
# boolean(3)=true negated — constant FALSE for every node — and so is
# not(last()) (last() >= 1). Only not(position() OP N) stays positional.
_PRED_NOT_POS = re.compile(r"^not\(\s*position\(\)\s*(!=|<=|>=|<|>|=)\s*(\d+)\s*\)$")
_PRED_NOT_CONST = re.compile(r"^not\(\s*(\d+|last\(\))\s*\)$")
# -- round-4 widening: !=, normalize-space(), string-length(), count() --
_PRED_ATTR_NEQ = re.compile(r"^@([\w-]+)\s*!=\s*([\"'])(.*?)\2$")
_PRED_TEXT_NEQ = re.compile(r"^text\(\)\s*!=\s*([\"'])(.*?)\1$")
# normalize-space(ARG) OP 'literal' — ARG empty (string(.)), text(), or @attr
_PRED_NSP_CMP = re.compile(
    r"^normalize-space\(\s*(text\(\)|@[\w-]+)?\s*\)\s*(!=|=)\s*([\"'])(.*?)\3$"
)
_PRED_STRLEN_CMP = re.compile(
    r"^string-length\(\s*(text\(\)|@[\w-]+)?\s*\)\s*(!=|<=|>=|<|>|=)\s*(\d+)$"
)
# count(node-test) OP N — child-axis node tests: tag, *, text()
_PRED_COUNT_CMP = re.compile(
    r"^count\(\s*([\w-]+|\*|text\(\))\s*\)\s*(!=|<=|>=|<|>|=)\s*(\d+)$"
)
# contains/starts-with over a normalize-space() inner call
_PRED_NSP_FN = re.compile(
    r"^(contains|starts-with)\(\s*normalize-space\(\s*(text\(\)|@[\w-]+)?\s*\)"
    r"\s*,\s*([\"'])(.*?)\3\s*\)$"
)
# child-element existence test: [li] / [*]; text-node existence: [text()];
# any-attribute presence: [@*]
_PRED_CHILD = re.compile(r"^(?!\d+$)([\w-]+|\*)$")
_PRED_NOT = re.compile(r"^not\(\s*(.*?)\s*\)$")


def _parse_scalar_pred(body: str):
    """Parse one non-positional XPath predicate body into its pred tuple, or
    None when outside the subset. ``not(...)`` recurses over any scalar
    form; positional forms inside not() are handled at the step level
    (_PRED_NOT_POS / _PRED_NOT_CONST) because they need node-set context."""
    if (mm := _PRED_ATTR_EQ.match(body)):
        return ("attr=", mm.group(1), mm.group(3))
    if (mm := _PRED_ATTR.match(body)):
        return ("attr?", mm.group(1))
    if body == "@*":
        return ("anyattr?",)
    if (mm := _PRED_CONTAINS_ATTR.match(body)):
        return ("attr~", mm.group(1), mm.group(3))
    if (mm := _PRED_CONTAINS_TEXT.match(body)):
        return ("text~", mm.group(2))
    if (mm := _PRED_STARTS_ATTR.match(body)):
        return ("attr^", mm.group(1), mm.group(3))
    if (mm := _PRED_STARTS_TEXT.match(body)):
        return ("text^", mm.group(2))
    if (mm := _PRED_TEXT_EQ.match(body)):
        return ("text=", mm.group(2))
    if (mm := _PRED_ATTR_NEQ.match(body)):
        return ("attr!=", mm.group(1), mm.group(3))
    if (mm := _PRED_TEXT_NEQ.match(body)):
        return ("text!=", mm.group(2))
    if (mm := _PRED_NSP_CMP.match(body)):
        return ("nsp", mm.group(1) or "", mm.group(2), mm.group(4))
    if (mm := _PRED_STRLEN_CMP.match(body)):
        return ("strlen", mm.group(1) or "", mm.group(2), int(mm.group(3)))
    if (mm := _PRED_COUNT_CMP.match(body)):
        return ("count", mm.group(1), mm.group(2), int(mm.group(3)))
    if (mm := _PRED_NSP_FN.match(body)):
        return ("nspfn", mm.group(1), mm.group(2) or "", mm.group(4))
    if body == "text()":
        return ("hastext",)
    if (mm := _PRED_CHILD.match(body)):
        # bare name = child-element existence (//ul[li]); 'text'/'not' etc.
        # can't reach here because the earlier forms didn't match and they
        # carry parens when meant as functions
        return ("child?", mm.group(1))
    if (mm := _PRED_NOT.match(body)):
        inner = _parse_scalar_pred(mm.group(1))
        if inner is not None:
            return ("notp", inner)
    return None
_STEP_RX = re.compile(r"^([a-zA-Z][\w-]*|\*|text\(\))((?:\[[^\]]*\])*)$")


_X_AXES = ("following-sibling", "preceding-sibling", "parent",
           "ancestor", "ancestor-or-self", "self",
           "descendant", "descendant-or-self",
           "following", "preceding")
# reverse axes: axis order is nearest-context-first (positional predicates
# count backwards from the context node); output still document order
_REVERSE_AXES = ("preceding-sibling", "ancestor", "ancestor-or-self",
                 "preceding")


class _XStep:
    __slots__ = ("axis", "xaxis", "name", "preds")

    def __init__(self, axis: str, text: str):
        self.axis = axis  # "desc" (//) or "child" (/)
        self.xaxis: Optional[str] = None  # explicit axis (axis::name), or None
        if "::" in text:
            ax, _, text = text.partition("::")
            ax = ax.strip()
            if ax == "attribute":
                # attribute::name ≡ @name (normalized below)
                text = "@" + text.strip()
            elif ax not in _X_AXES:
                raise ValueError(f"unsupported XPath axis: {ax}::")
            else:
                self.xaxis = ax
        if text.startswith("@"):
            # attribute step — yields attribute VALUE strings (lxml smart
            # strings); must be the final step, no predicates
            name = text[1:].strip()
            if not re.match(r"^(?:[\w-]+|\*)$", name):
                raise ValueError(f"unsupported attribute step: {text!r}")
            self.name = "@" + name
            self.preds = []
            return
        m = _STEP_RX.match(text)
        if not m:
            raise ValueError(f"unsupported XPath step: {text!r}")
        if self.xaxis and m.group(1) == "text()":
            raise ValueError("text() with an explicit axis is unsupported")
        self.name = m.group(1).lower() if m.group(1) != "text()" else "text()"
        self.preds: List[Tuple] = []
        for pm in re.finditer(r"\[([^\]]*)\]", m.group(2) or ""):
            body = pm.group(1).strip()
            if (mm := _PRED_POS_N.match(body)):
                self.preds.append(("pos", "=", int(mm.group(1))))
            elif _PRED_POS_LAST.match(body):
                self.preds.append(("pos", "last", 0))
            elif (mm := _PRED_POS_CMP.match(body)):
                self.preds.append(("pos", mm.group(1), int(mm.group(2))))
            elif (mm := _PRED_NOT_POS.match(body)):
                self.preds.append(("notpos", mm.group(1), int(mm.group(2))))
            elif _PRED_NOT_CONST.match(body):
                self.preds.append(("false",))  # not(number)/not(last()): see above
            else:
                pred = _parse_scalar_pred(body)
                if pred is None:
                    raise ValueError(f"unsupported XPath predicate: [{body}]")
                self.preds.append(pred)
        if self.name == "text()" and self.preds:
            raise ValueError("predicates on text() are unsupported")


def _parse_xpath(expr: str) -> List[_XStep]:
    expr = expr.strip()
    if not expr.startswith("/"):
        raise ValueError(f"only absolute XPath supported: {expr!r}")
    steps: List[_XStep] = []
    i = 0
    while i < len(expr):
        if expr.startswith("//", i):
            axis, i = "desc", i + 2
        elif expr.startswith("/", i):
            axis, i = "child", i + 1
        else:
            raise ValueError(f"malformed XPath: {expr!r}")
        j, depth = i, 0
        while j < len(expr) and (depth > 0 or expr[j] != "/"):
            if expr[j] == "[":
                depth += 1
            elif expr[j] == "]":
                depth -= 1
            j += 1
        if depth != 0:
            raise ValueError(f"unbalanced brackets in XPath: {expr!r}")
        step_text = expr[i:j]
        if not step_text:
            raise ValueError(f"empty XPath step in: {expr!r}")
        steps.append(_XStep(axis, step_text))
        i = j
    if not steps:
        raise ValueError(f"empty XPath: {expr!r}")
    for step in steps[:-1]:
        if step.name == "text()":
            raise ValueError("text() must be the final step")
        if step.name.startswith("@"):
            raise ValueError("attribute steps must be final")
    return steps


def _node_own_text(node: Node) -> str:
    return "".join(c for c in node.children if isinstance(c, str))


def _node_string_value(node: Node) -> str:
    """XPath ``string(.)``: every descendant text node concatenated, verbatim,
    in document order."""
    parts: List[str] = []

    def rec(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                rec(c)

    rec(node)
    return "".join(parts)


def _xp_string_arg(node: Node, arg: str) -> str:
    """The string a normalize-space()/string-length() argument evaluates to:
    '' → string(.); 'text()' → first text-node child (lxml: string() of a
    node-set takes the first node, '' when empty); '@name' → attribute value
    ('' when absent, per string() of an empty node-set)."""
    if not arg:
        return _node_string_value(node)
    if arg == "text()":
        for c in node.children:
            if isinstance(c, str):
                return c
        return ""
    return node.attrs.get(arg[1:]) or ""


def _num_cmp(n: int, op: str, val: int) -> bool:
    return (
        n == val if op == "="
        else n != val if op == "!="
        else n < val if op == "<"
        else n <= val if op == "<="
        else n > val if op == ">"
        else n >= val
    )


def _scalar_pred_ok(node: Node, pred: Tuple) -> bool:
    kind = pred[0]
    if kind == "attr=":
        return node.attrs.get(pred[1]) == pred[2]
    if kind == "attr?":
        return pred[1] in node.attrs
    if kind == "attr~":
        return pred[2] in (node.attrs.get(pred[1]) or "")
    if kind == "attr^":
        actual = node.attrs.get(pred[1])
        return actual is not None and actual.startswith(pred[2])
    if kind == "text~":
        return pred[1] in _node_own_text(node)
    if kind == "text^":
        return _node_own_text(node).startswith(pred[1])
    if kind == "text=":
        # XPath text()='v' is true when ANY text node equals v
        return any(isinstance(c, str) and c == pred[1] for c in node.children)
    if kind == "attr!=":
        # node-set != string: true iff the attribute EXISTS with a different
        # value (an absent attribute is an empty node-set → false)
        actual = node.attrs.get(pred[1])
        return actual is not None and actual != pred[2]
    if kind == "text!=":
        return any(isinstance(c, str) and c != pred[1] for c in node.children)
    if kind == "nsp":
        s = " ".join(_xp_string_arg(node, pred[1]).split())
        return s == pred[3] if pred[2] == "=" else s != pred[3]
    if kind == "strlen":
        return _num_cmp(len(_xp_string_arg(node, pred[1])), pred[2], pred[3])
    if kind == "nspfn":
        s = " ".join(_xp_string_arg(node, pred[2]).split())
        return pred[3] in s if pred[1] == "contains" else s.startswith(pred[3])
    if kind == "child?":
        name = pred[1]
        return any(
            isinstance(c, Node) and (name == "*" or c.tag == name)
            for c in node.children
        )
    if kind == "hastext":
        return any(isinstance(c, str) for c in node.children)
    if kind == "anyattr?":
        return bool(node.attrs)
    if kind == "notp":
        return not _scalar_pred_ok(node, pred[1])
    if kind == "count":
        test = pred[1]
        if test == "text()":
            n = sum(1 for c in node.children if isinstance(c, str))
        elif test == "*":
            n = sum(1 for c in node.children if isinstance(c, Node))
        else:
            n = sum(
                1 for c in node.children
                if isinstance(c, Node) and c.tag == test
            )
        return _num_cmp(n, pred[2], pred[3])
    raise AssertionError(kind)


def _pos_ok(pos: int, size: int, op: str, val: int) -> bool:
    return (
        pos == size if op == "last"
        else pos == val if op == "="
        else pos != val if op == "!="
        else pos < val if op == "<"
        else pos <= val if op == "<="
        else pos > val if op == ">"
        else pos >= val
    )


def _apply_positional(nodes: List[Node], op: str, val: int,
                      negate: bool = False) -> List[Node]:
    """XPath positional predicate semantics: position is 1-based WITHIN each
    parent's group of surviving candidates (``//div[2]`` = every div that is
    the 2nd matching div of its parent). ``negate`` implements
    ``not(position() OP N)`` — same grouping, inverted keep."""
    groups: Dict[int, List[Node]] = {}
    for n in nodes:
        groups.setdefault(id(n.parent), []).append(n)
    keep = set()
    for group in groups.values():
        size = len(group)
        for pos0, n in enumerate(group):
            if _pos_ok(pos0 + 1, size, op, val) != negate:
                keep.add(id(n))
    return [n for n in nodes if id(n) in keep]


def _axis_candidates(base: Node, axis: str) -> List[Node]:
    """Candidates along an explicit axis, in AXIS order (preceding-sibling
    is a reverse axis: nearest first, so positional predicates count from
    the context node, per XPath)."""
    if axis == "parent":
        p = base.parent
        return [p] if p is not None and p.tag != "[document]" else []
    if axis == "self":
        return [base]
    if axis in ("ancestor", "ancestor-or-self"):
        out = [base] if axis == "ancestor-or-self" else []
        p = base.parent
        while p is not None and p.tag != "[document]":
            out.append(p)  # nearest first (reverse axis order)
            p = p.parent
        return out
    if axis in ("descendant", "descendant-or-self"):
        out = [base] if axis == "descendant-or-self" else []
        out.extend(base.iter_nodes())
        return out
    if axis in ("following", "preceding"):
        # document-order axes: following = everything after the context node
        # minus its own descendants; preceding = everything before it minus
        # its ancestors (XPath 1.0 §2.2). From the document node both are
        # empty (every element is its descendant).
        root = base
        while root.parent is not None:
            root = root.parent
        all_nodes = list(root.iter_nodes())
        try:
            pos = next(i for i, n in enumerate(all_nodes) if n is base)
        except StopIteration:  # base IS the document node
            return []
        if axis == "following":
            desc = {id(d) for d in base.iter_nodes()}
            return [n for n in all_nodes[pos + 1:] if id(n) not in desc]
        anc, p = set(), base.parent
        while p is not None:
            anc.add(id(p))
            p = p.parent
        # reverse axis: nearest (last-in-document-order) first
        return [n for n in reversed(all_nodes[:pos]) if id(n) not in anc]
    sibs = _element_siblings(base)
    idx = next(i for i, s in enumerate(sibs) if s is base)
    if axis == "following-sibling":
        return sibs[idx + 1:]
    return list(reversed(sibs[:idx]))  # preceding-sibling, nearest first


def _apply_axis_positional(nodes: List[Node], op: str, val: int,
                           negate: bool = False) -> List[Node]:
    """Positional predicate along an explicit axis: position is 1-based in
    AXIS order per context node (the caller applies this per base).
    ``negate`` implements ``not(position() OP N)``."""
    size = len(nodes)
    return [n for pos0, n in enumerate(nodes)
            if _pos_ok(pos0 + 1, size, op, val) != negate]


def xpath_select(scope: Node, expr: str) -> List:
    """Evaluate the XPath subset. Returns Nodes (and raw strings for a final
    ``text()`` step) in document order, deduplicated like lxml node-sets.
    Top-level ``|`` unions evaluate each path and merge (nodes re-sorted to
    document order; text()-step strings appended in encounter order)."""
    paths = [p.strip() for p in _split_top_level(expr, "|") if p.strip()]
    if not paths:
        raise ValueError(f"empty XPath: {expr!r}")
    if len(paths) > 1:
        merged: List = []
        seen_ids = set()
        strings: List[str] = []
        for p in paths:
            for item in xpath_select(scope, p):
                if isinstance(item, Node):
                    if id(item) not in seen_ids:
                        seen_ids.add(id(item))
                        merged.append(item)
                else:
                    strings.append(item)
        order = {id(n): i for i, n in enumerate(scope.iter_nodes())}
        merged.sort(key=lambda n: order.get(id(n), -1))
        return merged + strings
    return _xpath_select_path(scope, paths[0])


def _xpath_select_path(scope: Node, expr: str) -> List:
    steps = _parse_xpath(expr)
    contexts: List[Node] = [scope]
    for step in steps:
        out: List = []
        seen = set()
        for ctx in contexts:
            if step.name == "text()":
                if step.axis == "child":
                    out.extend(c for c in ctx.children if isinstance(c, str))
                else:
                    out.extend(ctx.iter_text())
                continue
            if step.name.startswith("@"):
                # attribute VALUE strings, document order; one entry per
                # attribute node (equal values from different elements are
                # distinct nodes in lxml — no dedup)
                name = step.name[1:]
                # // ≡ descendant-or-self: the context node's own attributes
                # are in scope too (iter_nodes excludes self)
                bases = [ctx] if step.axis == "child" else (
                    [ctx] + list(ctx.iter_nodes())
                )
                for base in bases:
                    if name == "*":
                        out.extend(base.attrs.values())
                    elif name in base.attrs:
                        out.append(base.attrs[name])
                continue
            if step.xaxis is not None:
                # //axis::x ≡ descendant-or-self::node()/axis::x — the axis
                # applies from ctx AND every descendant; predicates
                # (positional ones in axis order) apply PER base node
                bases = [ctx] + (list(ctx.iter_nodes())
                                 if step.axis == "desc" else [])
                for base in bases:
                    cand = _axis_candidates(base, step.xaxis)
                    if step.name != "*":
                        cand = [n for n in cand if n.tag == step.name]
                    for pred in step.preds:
                        if pred[0] == "pos":
                            cand = _apply_axis_positional(cand, pred[1], pred[2])
                        elif pred[0] == "notpos":
                            cand = _apply_axis_positional(cand, pred[1], pred[2],
                                                          negate=True)
                        elif pred[0] == "false":
                            cand = []
                        else:
                            cand = [n for n in cand if _scalar_pred_ok(n, pred)]
                    if step.xaxis in _REVERSE_AXES:
                        cand.reverse()  # node-set output is document order
                    for n in cand:
                        if id(n) not in seen:
                            seen.add(id(n))
                            out.append(n)
                continue
            if step.axis == "child":
                cand = [c for c in ctx.children if isinstance(c, Node)]
            else:
                cand = list(ctx.iter_nodes())
            if step.name != "*":
                cand = [n for n in cand if n.tag == step.name]
            for pred in step.preds:
                if pred[0] == "pos":
                    cand = _apply_positional(cand, pred[1], pred[2])
                elif pred[0] == "notpos":
                    cand = _apply_positional(cand, pred[1], pred[2], negate=True)
                elif pred[0] == "false":
                    cand = []
                else:
                    cand = [n for n in cand if _scalar_pred_ok(n, pred)]
            for n in cand:
                if id(n) not in seen:
                    seen.add(id(n))
                    out.append(n)
        contexts = out
        if steps[-1] is step:
            return out
        # intermediate steps never contain strings (enforced at parse time)
    return contexts


# ---------------------------------------------------------------------------
# Extraction (O-42/O-43/O-44) — reference composition semantics
# ---------------------------------------------------------------------------

def _struct_eq(a, b) -> bool:
    """bs4 Tag equality: same tag, same attrs, same contents recursively
    (NavigableStrings compare as strings). The reference's CSS exclusion
    path removes via ``list.remove`` under THIS equality — a structurally
    identical earlier element is the one bs4 drops."""
    if isinstance(a, str) or isinstance(b, str):
        return a == b
    if a is b:
        return True
    if a.tag != b.tag or a.attrs != b.attrs:
        return False
    if len(a.children) != len(b.children):
        return False
    return all(_struct_eq(ca, cb) for ca, cb in zip(a.children, b.children))


def _remove_first_structeq(lst: List[Node], el: Node) -> None:
    """``list.remove(el)`` under bs4 structural equality: drop the FIRST
    element structurally equal to ``el`` (bs4's Tag.__eq__ semantics)."""
    for i, cand in enumerate(lst):
        if _struct_eq(cand, el):
            del lst[i]
            return


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
                    # searches descendants only). Removal is by bs4
                    # STRUCTURAL equality, exactly like the reference's
                    # ``extracted.remove(element)`` on Tag objects.
                    if css_select(element, exclude):
                        _remove_first_structeq(extracted, element)
                        break
                    # the element ITSELF matches, probed via the parent scope
                    parent = element.parent
                    if parent is not None and any(
                        _struct_eq(element, m)
                        for m in css_select(parent, exclude)
                    ):
                        _remove_first_structeq(extracted, element)
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
        if not isinstance(element, Node):
            # a trailing text() step yields strings; the reference's
            # ``' '.join(element.itertext())`` raises AttributeError on lxml
            # smart strings and SKIPS them (selector_utils.py:158-165) —
            # replicate that skip.
            continue
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


def test_selectors(html: str,
                   css_selectors: Optional[List[str]] = None,
                   xpath_expressions: Optional[List[str]] = None) -> Dict[str, str]:
    """≙ SelectorExtractor.test_selectors (selector_utils.py:262-289): run
    each method and return its extracted content for comparison."""
    results: Dict[str, str] = {}
    if css_selectors:
        results["css"] = extract_by_css(html, css_selectors)
    if xpath_expressions:
        results["xpath"] = extract_by_xpath(html, xpath_expressions)
    if css_selectors and xpath_expressions:
        results["combined"] = extract_combined(html, css_selectors, xpath_expressions)
    return results


def selector_report(html: str,
                    css_selectors: Optional[List[str]] = None,
                    xpath_expressions: Optional[List[str]] = None) -> List[Dict]:
    """Per-selector debugging report (the data behind the reference's
    selector-test menu, main.py:534-604): validity, match count, and a
    200-char preview of the first match's text."""
    rows: List[Dict] = []
    root = parse_dom(html or "")
    for kind, sels, select, text_of in (
        ("css", css_selectors or [], css_select,
         lambda n: n.get_text(separator=" ", strip=True)),
        ("xpath", xpath_expressions or [], xpath_select,
         lambda n: n.itertext_join() if isinstance(n, Node) else str(n)),
    ):
        for sel in sels:
            row: Dict = {"kind": kind, "selector": sel}
            try:
                matches = select(root, sel)
            except Exception as exc:
                row.update(valid=False, error=str(exc), matches=0, preview="")
                rows.append(row)
                continue
            first = ""
            for m in matches:
                first = text_of(m)
                if first:
                    break
            row.update(
                valid=True, error=None, matches=len(matches),
                preview=" ".join(first.split())[:200],
            )
            rows.append(row)
    return rows


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
