"""Selector-engine semantics (SURVEY §2 O-42..O-47) — stdlib CSS/XPath subset
with the reference's composition quirks (selector_utils.py)."""

from crawl4ai_scraper_spark.kernel.selectors import (
    SELECTOR_TEMPLATES,
    css_select,
    extract_by_css,
    extract_by_xpath,
    extract_combined,
    extract_with_template,
    parse_dom,
    validate_css_selector,
    validate_xpath,
    xpath_select,
)

DOC = """
<html><body>
  <nav><a href="/">Home</a></nav>
  <main>
    <article class="post-content" id="a1">
      <h1>Title One</h1>
      <p>First <b>bold</b> paragraph.</p>
      <div class="comments"><p>spam comment</p></div>
    </article>
    <article class="entry-content extra">
      <p>Second entry body.</p>
    </article>
  </main>
  <aside class="sidebar"><p>widgets</p></aside>
  <div class="post-content"><p>Loose div content.</p></div>
</body></html>
"""


class TestCssSubset:
    def test_tag_and_class_and_id(self):
        root = parse_dom(DOC)
        assert len(css_select(root, "article")) == 2
        assert len(css_select(root, ".post-content")) == 2
        assert len(css_select(root, "article.post-content")) == 1
        assert len(css_select(root, "#a1")) == 1
        assert len(css_select(root, "div.post-content")) == 1

    def test_descendant_and_child(self):
        root = parse_dom(DOC)
        assert len(css_select(root, "main article")) == 2
        assert len(css_select(root, "main > article")) == 2
        assert len(css_select(root, "body > article")) == 0
        assert len(css_select(root, "article p")) == 3  # incl. comment spam
        assert len(css_select(root, "article > p")) == 2

    def test_comma_groups_document_order(self):
        root = parse_dom(DOC)
        tags = [n.tag for n in css_select(root, "h1, aside, nav")]
        assert tags == ["nav", "h1", "aside"]  # document order, not group order

    def test_multi_class_and_attr(self):
        root = parse_dom(DOC)
        assert len(css_select(root, ".entry-content.extra")) == 1
        assert len(css_select(root, '[id=a1]')) == 1

    def test_invalid_selector_raises(self):
        root = parse_dom(DOC)
        for bad in ("p:first-child", "a[href^=x]", "", ">", "div >"):
            try:
                css_select(root, bad)
                raised = False
            except Exception:
                raised = True
            assert raised, bad


class TestXpathSubset:
    def test_forms(self):
        root = parse_dom(DOC)
        assert len(xpath_select(root, "//article")) == 2
        assert len(xpath_select(root, '//article[@id="a1"]')) == 1
        assert len(xpath_select(root, '//div[contains(@class, "post")]')) == 1
        assert len(xpath_select(root, "//aside")) == 1

    def test_invalid_raises(self):
        root = parse_dom(DOC)
        for bad in ("//a/b", "article", "//div[text()='x']"):
            try:
                xpath_select(root, bad)
                raised = False
            except Exception:
                raised = True
            assert raised, bad


class TestReferenceComposition:
    def test_css_text_and_join(self):
        out = extract_by_css(DOC, ["article.entry-content"])
        assert out == "Second entry body."

    def test_css_invalid_selector_skipped(self):
        out = extract_by_css(DOC, ["p::bogus", ".entry-content"])
        assert out == "Second entry body."

    def test_exclusion_by_contained_descendant(self):
        # article #a1 CONTAINS .comments → dropped entirely (containment,
        # not subtraction — selector_utils.py:84-99)
        out = extract_by_css(DOC, ["article"], exclude_selectors=[".comments"])
        assert out == "Second entry body."

    def test_exclusion_by_self_match(self):
        out = extract_by_css(DOC, [".sidebar"], exclude_selectors=["aside"])
        assert out == ""

    def test_xpath_extraction_and_exclusion(self):
        out = extract_by_xpath(DOC, ["//article"], exclude_xpath=['//article[@id="a1"]'])
        assert out == "Second entry body."

    def test_combined_dedup_100char_prefix(self):
        out = extract_combined(
            DOC,
            css_selectors=["article.entry-content"],
            xpath_expressions=['//article[contains(@class, "entry-content")]'],
        )
        # identical css and xpath parts → deduped to one
        assert out == "Second entry body."

    def test_template_extraction(self):
        out = extract_with_template(DOC, "blog")
        # 'article' matches both, CSS exclusion drops #a1 (contains
        # .comments); '.post-content' also matches the loose div
        assert "Second entry body." in out
        assert "Loose div content." in out
        assert extract_with_template(DOC, "nope") == ""
        # the CSS part is containment-excluded…
        css_part = extract_by_css(DOC, SELECTOR_TEMPLATES["blog"]["css"],
                                  SELECTOR_TEMPLATES["blog"]["exclude_css"])
        assert "spam comment" not in css_part
        # …while the XPath part keeps #a1 ('//article' survives exclusion
        # because xpath exclusion removes IDENTICAL elements only —
        # selector_utils.py:145-152 — so its comment text remains)
        assert "spam comment" in out

    def test_validation_probes(self):
        assert validate_css_selector("article.post-content")[0]
        assert not validate_css_selector("p:first-child")[0]
        assert validate_xpath('//div[@class="x"]')[0]
        assert not validate_xpath("div")[0]

    def test_all_template_selectors_supported(self):
        # every selector the reference templates use must parse in our subset
        for tpl in SELECTOR_TEMPLATES.values():
            for sel in tpl["css"] + tpl["exclude_css"]:
                assert validate_css_selector(sel)[0], sel
            for xp in tpl["xpath"] + tpl["exclude_xpath"]:
                assert validate_xpath(xp)[0], xp


class TestSelectorCleaningDispatch:
    def test_clean_with_selectors_threshold(self):
        from crawl4ai_scraper_spark.kernel.cleaning import CleaningConfig, clean_with_selectors

        cfg = CleaningConfig.build(min_content_length=10)
        long_content = extract_by_css(DOC, ["article.entry-content"])
        assert clean_with_selectors("", "fallback markdown", "T", cfg, long_content) \
            == clean_with_selectors("", long_content, "T", cfg, None)
        short = "tiny"
        out = clean_with_selectors("", "# Fallback Markdown Body Here", "T", cfg, short)
        assert "Fallback" in out
