"""The markdown-cleaning pipeline — the byte-identical-text contract.

Re-implements, function-by-function, the observable behavior of the
reference's ContentCleaner / ConfigurableContentCleaner
(/root/reference/content_filters.py) and the post-clean fallback in
ContentCrawler.crawl_single_url (/root/reference/crawler.py:467-484).

Several regexes in the reference are raw strings with DOUBLED backslashes
(content_filters.py:171, 197, 219, 323, 324). As regexes they therefore match
a literal backslash / literal ``s`` etc., so the section-heading and
numbered-list branches never fire on real markdown and the utm/ref strippers
match ``utm_…`` without its ``?``. These are bugs in the reference — and they
are replicated VERBATIM below, because the parity contract is byte-identical
output, not intended behavior. Do not "fix" them.

Pipeline shape (content_filters.py:58-145):
  1. unescape ``\\n`` when literal backslash-n outnumbers real newlines
  2. single-long-line repair (only when <10 newlines and >500 chars)
  3. line loop: cut at first footer line; skip skip-patterns and nav sections;
     wait for the main-content start; drop link-heavy nav lines; enhance
  4. whitespace cleanup (≥3 newlines → 2, rstrip lines, trim blank edges)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional

# ---------------------------------------------------------------------------
# Behavioral constants — verbatim from content_filters.py:17-56 (data, not
# code: these exact strings decide which lines survive cleaning).
# ---------------------------------------------------------------------------

NAV_INDICATORS: List[str] = [
    "search", "menu", "navigation", "navbar", "sidebar", "breadcrumb",
    "home", "contact", "about", "login", "sign in", "sign up", "register",
    "skip to content", "skip to main", "toggle menu", "close menu",
]

FOOTER_INDICATORS: List[str] = [
    "copyright", "©", "all rights reserved", "privacy policy", "terms of service",
    "terms of use", "cookie policy", "was this page helpful", "feedback",
    "x.com", "twitter.com", "linkedin.com", "facebook.com", "github.com",
    "on this page", "yesno", "rate this page", "improve this page",
    "last modified", "last updated", "edit this page",
]

SKIP_PATTERNS: List[str] = [
    "copy page",
    "copy link",
    "share this",
    "print this page",
    "bookmark",
    "loading...",
    "please wait",
    "skip to content",
    "toggle navigation",
]

# content_filters.py:241-246
NAV_SECTION_STARTS: List[str] = [
    "search", "navigation", "menu", "breadcrumb",
    "skip to", "table of contents", "getting started",
    "##### getting started", "##### build with", "##### deployment",
    "##### administration", "##### configuration", "##### reference",
]

# content_filters.py:259
LIKELY_NAV_TERMS: List[str] = ["overview", "quickstart", "getting started", "reference", "home"]

# content_filters.py:158 — nav words that disqualify a '# ' heading
_H1_NAV_WORDS = ("home", "menu", "navigation", "page")

# Buggy double-backslash regexes, verbatim (see module docstring).
_SECTION_HEADING_RX = re.compile(r"^#{2,6}\\s+\\w")
_SECTION_HEADING_STRIP_RX = re.compile(r"^#{2,6}\\s+")
_NUMBERED_LIST_RX = re.compile(r"^\\d+\\.\\s")
_UTM_RX = re.compile(r"(\\?utm_[^\\s]+)")
_REF_RX = re.compile(r"(\\?ref=[^\\s]+)")

# Correct regexes used by the long-line repair (content_filters.py:82-88).
_SENTENCE_BREAK_RX = re.compile(r"(?<![eg])(?<![ie])\. ([A-Z])")
_ADMONITION_INJECT_RX = re.compile(r"(?<!\n)(Tip|Note|Warning|Important|Caution)\s+([A-Z])")
_SECTION_INJECT_RX = re.compile(
    r"(?<!\n)(Using|Creating|Configuring|Setting up|Installing|Troubleshooting|"
    r"Managing|Building|Deploying)\s+([a-z][^.]*?)(?=\s[A-Z])"
)
_EXCESS_NEWLINES_RX = re.compile(r"\n{3,}")

# crawler.py:482-484 — fixed fallback strings (byte-exact).
MINIMAL_MARKDOWN_NOTE = "[Note: Minimal markdown extracted, showing cleaned content]"
NO_CONTENT_PLACEHOLDER = "[No substantial content could be extracted from this page]"


@dataclass
class CleaningConfig:
    """Mirror of the ConfigurableContentCleaner knobs that affect text output
    (content_filters.py:345-415). The default instance behaves exactly like
    the plain ContentCleaner the reference uses when no custom settings are
    given (crawler.py:263-286)."""

    nav_indicators: List[str] = field(default_factory=lambda: list(NAV_INDICATORS))
    footer_indicators: List[str] = field(default_factory=lambda: list(FOOTER_INDICATORS))
    skip_patterns: List[str] = field(default_factory=lambda: list(SKIP_PATTERNS))
    min_content_length: int = 100
    cleaning_profile: str = "moderate"
    # Selector-based extraction (O-42..O-47): when any of these are set the
    # extraction path tries extract_combined first and falls back to markdown
    # cleaning below min_content_length (content_filters.py:445-465).
    content_css_selectors: List[str] = field(default_factory=list)
    content_xpath: List[str] = field(default_factory=list)
    exclude_css_selectors: List[str] = field(default_factory=list)
    exclude_xpath: List[str] = field(default_factory=list)

    @property
    def uses_selectors(self) -> bool:
        return bool(self.content_css_selectors or self.content_xpath)

    @classmethod
    def build(
        cls,
        custom_nav_patterns: Optional[List[str]] = None,
        custom_footer_patterns: Optional[List[str]] = None,
        custom_skip_patterns: Optional[List[str]] = None,
        min_content_length: int = 100,
        cleaning_profile: str = "moderate",
        content_css_selectors: Optional[List[str]] = None,
        content_xpath: Optional[List[str]] = None,
        exclude_css_selectors: Optional[List[str]] = None,
        exclude_xpath: Optional[List[str]] = None,
        selector_template: Optional[str] = None,
    ) -> "CleaningConfig":
        cfg = cls(min_content_length=min_content_length, cleaning_profile=cleaning_profile)
        if selector_template:
            # ≙ set_selector_template (content_filters.py:467-479)
            from crawl4ai_scraper_spark.kernel.selectors import get_template

            template = get_template(selector_template)
            if template:
                cfg.content_css_selectors = list(template.get("css", []))
                cfg.content_xpath = list(template.get("xpath", []))
                cfg.exclude_css_selectors = list(template.get("exclude_css", []))
                cfg.exclude_xpath = list(template.get("exclude_xpath", []))
        if content_css_selectors:
            cfg.content_css_selectors = list(content_css_selectors)
        if content_xpath:
            cfg.content_xpath = list(content_xpath)
        if exclude_css_selectors:
            cfg.exclude_css_selectors = list(exclude_css_selectors)
        if exclude_xpath:
            cfg.exclude_xpath = list(exclude_xpath)
        if custom_nav_patterns:
            cfg.nav_indicators.extend(custom_nav_patterns)
        if custom_footer_patterns:
            cfg.footer_indicators.extend(custom_footer_patterns)
        if custom_skip_patterns:
            cfg.skip_patterns.extend(custom_skip_patterns)
        # Profile application AFTER the custom extensions, matching the
        # __init__ order in content_filters.py:376-402.
        if cleaning_profile == "strict":
            cfg.min_content_length = 200
            cfg.nav_indicators.extend(["menu", "nav", "sidebar", "header", "footer"])
            cfg.skip_patterns.extend(["advertisement", "sponsored", "promotion"])
        elif cleaning_profile == "minimal":
            cfg.min_content_length = 50
        return cfg


_DEFAULT_CFG = CleaningConfig()


# ---------------------------------------------------------------------------
# Line classifiers (content_filters.py:191-273)
# ---------------------------------------------------------------------------

def _is_main_heading(line: str) -> bool:
    return line.startswith("# ") and len(line.strip()) > 3


def _is_section_heading(line: str) -> bool:
    # Dead branch by construction: the doubled backslashes mean this only
    # matches a literal "\s" after the hashes (content_filters.py:197).
    return _SECTION_HEADING_RX.match(line) is not None


def _is_substantial_paragraph(line: str, cfg: CleaningConfig) -> bool:
    stripped = line.strip()
    if len(stripped) < 20:
        return False
    if len(stripped.split()) < 4:
        return False
    lower = stripped.lower()
    # Only the five most common nav terms gate paragraphs
    # (content_filters.py:210 slices nav_indicators[:5]).
    return not any(term in lower for term in cfg.nav_indicators[:5])


def _is_content_list(line: str, cfg: CleaningConfig) -> bool:
    stripped = line.strip()
    is_marker = (
        stripped.startswith("- ")
        or stripped.startswith("* ")
        or _NUMBERED_LIST_RX.match(stripped) is not None  # dead: literal "\d"
    )
    if not is_marker:
        return False
    if len(stripped) < 10:
        return False
    lower = stripped.lower()
    return not any(term in lower for term in cfg.nav_indicators)


def _is_navigation_section(line: str) -> bool:
    lower = line.lower()
    return any(start in lower for start in NAV_SECTION_STARTS)


def _is_likely_navigation(line: str) -> bool:
    lower = line.lower()
    if line.count("[") > 3 and line.count("](") > 3:
        return True
    if any(term in lower for term in LIKELY_NAV_TERMS) and len(line.strip()) < 100:
        return True
    return False


def _is_footer_line(line: str, cfg: CleaningConfig) -> bool:
    lower = line.lower()
    return any(term in lower for term in cfg.footer_indicators)


def _should_skip_line(line: str, cfg: CleaningConfig) -> bool:
    lower = line.lower()
    return any(pat in lower for pat in cfg.skip_patterns)


def _is_main_content_start(line: str, title: str, cfg: CleaningConfig) -> bool:
    """content_filters.py:147-189 — does this (stripped) line open the main
    content? Checked only while content has not started yet."""
    if line.startswith("# "):
        heading = line[2:].strip().lower()
        if not any(word in heading for word in _H1_NAV_WORDS):
            if title:
                title_words = set(title.lower().split())
                heading_words = set(heading.split())
                if len(title_words & heading_words) / max(len(title_words), 1) >= 0.5:
                    return True
            if len(heading) > 10:
                return True

    if _SECTION_HEADING_RX.match(line) and len(line.strip()) > 10:  # dead branch
        heading = _SECTION_HEADING_STRIP_RX.sub("", line).strip().lower()
        if not any(term in heading for term in cfg.nav_indicators):
            return True

    if _is_substantial_paragraph(line, cfg):
        return True
    if _is_content_list(line, cfg):
        return True
    if line.startswith("```") or line.strip().startswith("`"):
        return True
    return False


# ---------------------------------------------------------------------------
# Per-line enhancement (content_filters.py:275-326)
# ---------------------------------------------------------------------------

def _enhance_admonitions(line: str) -> str:
    stripped = line.strip()
    if stripped.startswith("Note:") or stripped.startswith("NOTE:"):
        return line.replace("Note:", "> **Note:**").replace("NOTE:", "> **Note:**")
    if stripped.startswith("Tip:") or stripped.startswith("TIP:"):
        return line.replace("Tip:", "> **Tip:**").replace("TIP:", "> **Tip:**")
    if stripped.startswith("Warning:") or stripped.startswith("WARNING:"):
        return line.replace("Warning:", "> **⚠️ Warning:**").replace("WARNING:", "> **⚠️ Warning:**")
    if stripped.startswith("Important:") or stripped.startswith("IMPORTANT:"):
        return line.replace("Important:", "> **❗ Important:**").replace("IMPORTANT:", "> **❗ Important:**")
    return line


def _enhance_links(line: str) -> str:
    # Doubled-backslash patterns verbatim — they strip "utm_…"/"ref=…" runs
    # (terminated by 's' or '\') with an OPTIONAL leading backslash, never the
    # actual "?" (content_filters.py:323-324).
    line = _UTM_RX.sub("", line)
    return _REF_RX.sub("", line)


def _enhance_line(line: str) -> str:
    """content_filters.py:275-288. ``_enhance_code_blocks`` only records
    ``_prev_line`` and never changes its input (306-318) — omitted as a
    provable no-op on output."""
    if not line.strip():
        return line
    return _enhance_links(_enhance_admonitions(line))


def _collapse_whitespace(content: str) -> str:
    """content_filters.py:328-342."""
    content = _EXCESS_NEWLINES_RX.sub("\n\n", content)
    lines = [ln.rstrip() for ln in content.split("\n")]
    while lines and not lines[0].strip():
        lines.pop(0)
    while lines and not lines[-1].strip():
        lines.pop()
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Main entry points
# ---------------------------------------------------------------------------

def clean_markdown(markdown: str, title: str = "", cfg: Optional[CleaningConfig] = None) -> str:
    """≙ ContentCleaner.clean_markdown_content (content_filters.py:58-145)."""
    if not markdown:
        return markdown
    cfg = cfg or _DEFAULT_CFG

    # Unescape literal backslash-n when it dominates real newlines (76-77).
    if "\\n" in markdown and markdown.count("\\n") > markdown.count("\n"):
        markdown = markdown.replace("\\n", "\n")

    # Single-long-line repair (80-98). The "table detection" loop at 90-98
    # computes and discards — a no-op on output, omitted.
    if markdown.count("\n") < 10 and len(markdown) > 500:
        markdown = _SENTENCE_BREAK_RX.sub(r".\n\n\1", markdown)
        markdown = _ADMONITION_INJECT_RX.sub(r"\n\n**\1:** \2", markdown)
        markdown = _SECTION_INJECT_RX.sub(r"\n\n## \1 \2", markdown)

    kept: List[str] = []
    content_started = False
    skipping_nav_section = True

    for line in markdown.split("\n"):
        stripped = line.strip()

        if not content_started and not stripped:
            continue
        if _is_footer_line(stripped, cfg):
            break  # everything from the first footer line on is dropped (114-116)
        if _should_skip_line(stripped, cfg):
            continue
        if skipping_nav_section and _is_navigation_section(stripped):
            continue
        if not content_started:
            if _is_main_content_start(stripped, title, cfg):
                content_started = True
                skipping_nav_section = False
            else:
                continue
        # NB: the line that just started the content is itself subject to this
        # filter — exactly as in the reference flow (136-137).
        if content_started and _is_likely_navigation(stripped):
            continue
        kept.append(_enhance_line(line))

    return _collapse_whitespace("\n".join(kept))


def clean_with_selectors(
    html: str,
    markdown: str,
    title: str = "",
    cfg: Optional[CleaningConfig] = None,
    selector_content: Optional[str] = None,
) -> str:
    """≙ ConfigurableContentCleaner.clean_with_selectors
    (content_filters.py:445-465). ``selector_content`` is the pre-extracted
    CSS/XPath text (the bs4/lxml extraction runs only when those libs are
    available — see kernel.selectors); ``None`` falls back to markdown
    cleaning, same as an unconfigured extractor."""
    cfg = cfg or _DEFAULT_CFG
    if selector_content and len(selector_content) >= cfg.min_content_length:
        return clean_markdown(selector_content, title, cfg)
    return clean_markdown(markdown, title, cfg)


def finalize_text(cleaned: str, cleaned_html: Optional[str]) -> str:
    """≙ the post-clean quality gate in crawler.py:475-484: if the cleaned
    text strips to <100 chars, substitute the cleaned-HTML note, or — only
    when the cleaned text is completely empty — the fixed placeholder."""
    if len(cleaned.strip()) < 100:
        if cleaned_html:
            return f"{MINIMAL_MARKDOWN_NOTE}\n\n{cleaned_html}"
        if not cleaned:
            return NO_CONTENT_PLACEHOLDER
    return cleaned
