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
        for bad in ("p:hover", "p::before", "", ">", "div >", "div{", "..c",
                    "#m)", "a[", ":nth-child(x)"):
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
        for bad in ("article", "//article[", "//main//", "div[@class='c']",
                    "//div[sum(p)>1]", "//div[count(p/a)>1]", "//a/text()[1]"):
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
        assert validate_css_selector("p:first-child")[0]  # supported since r2
        assert not validate_css_selector("p:hover")[0]
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


EXT_DOC = """
<html><body>
  <div class="wrap">
    <p id="p1">alpha</p>
    <p id="p2">beta</p>
    <span id="s1">mid</span>
    <p id="p3">gamma</p>
    <p id="p4">delta</p>
  </div>
  <ul>
    <li><a href="/docs/intro" lang="en-US" data-k="one two">Intro</a></li>
    <li><a href="/blog/x.html" title="hello world">Blog</a></li>
    <li><a href="https://ext.example/page">Ext</a></li>
  </ul>
  <section><article><p>only</p></article></section>
</body></html>
"""


def _ids(nodes):
    return [n.attrs.get("id") for n in nodes]


class TestCssExtensions:
    """Round-2 additions: pseudo-classes, attribute operators, siblings."""

    def test_first_last_only_child(self):
        root = parse_dom(EXT_DOC)
        assert _ids(css_select(root, ".wrap p:first-child")) == ["p1"]
        assert _ids(css_select(root, "p:first-child")) == ["p1", None]  # + article's only p
        assert _ids(css_select(root, ".wrap p:last-child")) == ["p4"]
        assert [n.tag for n in css_select(root, "article :only-child")] == ["p"]

    def test_nth_child(self):
        root = parse_dom(EXT_DOC)
        assert _ids(css_select(root, ".wrap p:nth-child(2)")) == ["p2"]
        assert _ids(css_select(root, ".wrap :nth-child(odd)")) == ["p1", "s1", "p4"]
        assert _ids(css_select(root, ".wrap p:nth-child(2n+1)")) == ["p1", "p4"]
        assert _ids(css_select(root, ".wrap :nth-last-child(1)")) == ["p4"]

    def test_attribute_operators(self):
        root = parse_dom(EXT_DOC)
        sel = lambda s: [n.attrs.get("href") for n in css_select(root, s)]
        assert sel('a[href^="/docs"]') == ["/docs/intro"]
        assert sel('a[href$=".html"]') == ["/blog/x.html"]
        assert sel('a[href*="blog"]') == ["/blog/x.html"]
        assert sel('a[data-k~="two"]') == ["/docs/intro"]
        assert sel('a[lang|="en"]') == ["/docs/intro"]
        assert len(css_select(root, "a[title]")) == 1
        # ^= with empty value matches nothing (spec)
        assert sel('a[href^=""]') == []

    def test_sibling_combinators(self):
        root = parse_dom(EXT_DOC)
        assert _ids(css_select(root, "#p2 + span")) == ["s1"]
        assert _ids(css_select(root, "span + p")) == ["p3"]
        assert _ids(css_select(root, "#p1 ~ p")) == ["p2", "p3", "p4"]
        assert css_select(root, "#p3 + span") == []

    def test_quoted_values_with_combinator_chars(self):
        root = parse_dom(parse_chars_doc := '<div><a title="a > b" href="#">x</a></div>')
        assert len(css_select(root, 'a[title="a > b"]')) == 1


class TestXPathExtensions:
    """Round-2 additions: multi-step paths, positional predicates, text()."""

    def test_multi_step_paths(self):
        root = parse_dom(EXT_DOC)
        assert [n.tag for n in xpath_select(root, "//section//p")] == ["p"]
        assert len(xpath_select(root, "//ul/li")) == 3
        assert len(xpath_select(root, "//ul/li/a")) == 3
        assert xpath_select(root, "//section/p") == []  # p is not a CHILD
        assert len(xpath_select(root, "//div/*")) == 5

    def test_positional_predicates(self):
        root = parse_dom(EXT_DOC)
        assert _ids(xpath_select(root, "//div/p[2]")) == ["p2"]
        assert _ids(xpath_select(root, "//div/p[last()]")) == ["p4"]
        assert _ids(xpath_select(root, "//div/p[position()<3]")) == ["p1", "p2"]
        # abbreviated //tag[N]: per-parent position
        assert len(xpath_select(root, "//li[1]")) == 1
        assert _ids(xpath_select(root, "//p[1]")) == ["p1", None]  # div group + article group

    def test_attr_presence_and_text_predicates(self):
        root = parse_dom(EXT_DOC)
        assert len(xpath_select(root, "//a[@title]")) == 1
        assert [n.attrs.get("id") for n in xpath_select(root, "//p[text()='alpha']")] == ["p1"]
        assert _ids(xpath_select(root, "//p[contains(text(), 'amm')]")) == ["p3"]

    def test_text_step_returns_strings_and_extract_skips_them(self):
        root = parse_dom(EXT_DOC)
        texts = xpath_select(root, "//div/p/text()")
        assert texts == ["alpha", "beta", "gamma", "delta"]
        # the extraction layer skips smart strings like the reference
        assert extract_by_xpath(EXT_DOC, ["//div/p/text()"]) == ""
        assert "alpha" in extract_by_xpath(EXT_DOC, ["//div/p[1]"])

    def test_validation_matrix_from_reference(self):
        # /root/reference/tests/test_selectors.py:95-117 matrix
        for ok in ("//article", "//div[@class='content']", "//main//p"):
            assert validate_xpath(ok)[0], ok
        for bad in ("//article[", "//main//"):
            assert not validate_xpath(bad)[0], bad


class TestCssRound3Extensions:
    """Round-3 additions (VERDICT r2 #5): :not(), the of-type family."""

    def test_not_simple(self):
        root = parse_dom(EXT_DOC)
        assert _ids(css_select(root, ".wrap p:not(#p2)")) == ["p1", "p3", "p4"]
        assert _ids(css_select(root, ".wrap :not(p)")) == ["s1"]
        # CSS4 selector list argument
        assert _ids(css_select(root, ".wrap p:not(#p2, #p4)")) == ["p1", "p3"]
        # nested functional pseudo inside :not
        assert _ids(css_select(root, ".wrap p:not(:nth-child(2))")) == ["p1", "p3", "p4"]

    def test_not_invalid_argument_is_invalid_selector(self):
        # round 4 admits complex selectors inside :not(); empty or
        # relative-combinator arguments stay outside the subset
        ok, _ = validate_css_selector("p:not(div > p)")
        assert ok
        ok, _ = validate_css_selector("p:not()")
        assert not ok
        ok, _ = validate_css_selector("p:not(> p)")
        assert not ok
        # and the extraction layer skips an invalid one silently
        assert extract_by_css(EXT_DOC, ["p:not()"]) == ""

    def test_of_type_family(self):
        root = parse_dom(EXT_DOC)
        assert _ids(css_select(root, ".wrap p:first-of-type")) == ["p1"]
        assert _ids(css_select(root, ".wrap p:last-of-type")) == ["p4"]
        assert _ids(css_select(root, ".wrap span:only-of-type")) == ["s1"]
        assert _ids(css_select(root, ".wrap p:nth-of-type(3)")) == ["p3"]
        # p3 is the 4th CHILD but the 3rd p — of-type indexes same-tag only
        assert _ids(css_select(root, ".wrap p:nth-child(3)")) == []
        assert _ids(css_select(root, ".wrap p:nth-last-of-type(1)")) == ["p4"]
        assert _ids(css_select(root, ".wrap p:nth-of-type(odd)")) == ["p1", "p3"]

    def test_comma_inside_not_does_not_split_groups(self):
        root = parse_dom(EXT_DOC)
        # one :not(a, b) group plus a separate #s1 group
        got = _ids(css_select(root, ".wrap p:not(#p1, #p2), #s1"))
        assert got == ["s1", "p3", "p4"]


class TestXPathRound3Extensions:
    """Round-3 additions (VERDICT r2 #5): starts-with(), union |, axes."""

    def test_starts_with_attr_and_text(self):
        root = parse_dom(EXT_DOC)
        hrefs = [n.attrs.get("href")
                 for n in xpath_select(root, "//a[starts-with(@href, '/docs')]")]
        assert hrefs == ["/docs/intro"]
        assert _ids(xpath_select(root, "//p[starts-with(text(), 'gam')]")) == ["p3"]

    def test_union_document_order_dedup(self):
        root = parse_dom(EXT_DOC)
        got = xpath_select(root, "//span | //div/p[1] | //span")
        assert _ids(got) == ["p1", "s1"]  # doc order, dedup'd
        tags = [n.tag for n in xpath_select(root, "//article | //ul")]
        assert tags == ["ul", "article"]

    def test_following_sibling_axis(self):
        root = parse_dom(EXT_DOC)
        assert _ids(xpath_select(root, "//span/following-sibling::p")) == ["p3", "p4"]
        assert _ids(xpath_select(root, "//span/following-sibling::p[1]")) == ["p3"]
        assert _ids(xpath_select(root, "//p[@id='p1']/following-sibling::*[last()]")) == ["p4"]

    def test_preceding_sibling_axis_reverse_positions(self):
        root = parse_dom(EXT_DOC)
        # position 1 on a reverse axis = NEAREST preceding
        assert _ids(xpath_select(root, "//span/preceding-sibling::p[1]")) == ["p2"]
        # node-set output is still document order
        assert _ids(xpath_select(root, "//span/preceding-sibling::p")) == ["p1", "p2"]

    def test_parent_axis(self):
        root = parse_dom(EXT_DOC)
        assert [n.tag for n in xpath_select(root, "//p[@id='p1']/parent::div")] == ["div"]
        assert xpath_select(root, "//p[@id='p1']/parent::ul") == []
        # dedup: all four p's share one parent div
        assert len(xpath_select(root, "//div/p/parent::div")) == 1

    def test_ancestor_axis(self):
        root = parse_dom("<div id='d1'><ul id='u1'><li id='l1'><a id='a1'>x</a></li></ul></div>")
        assert _ids(xpath_select(root, "//a/ancestor::*")) == ["d1", "u1", "l1"]
        assert _ids(xpath_select(root, "//a/ancestor::ul")) == ["u1"]
        # reverse axis: position 1 = NEAREST ancestor
        assert _ids(xpath_select(root, "//a/ancestor::*[1]")) == ["l1"]
        assert _ids(xpath_select(root, "//a/ancestor-or-self::*[1]")) == ["a1"]

    def test_self_and_descendant_axes(self):
        root = parse_dom(EXT_DOC)
        assert _ids(xpath_select(root, "//p[@id='p1']/self::p")) == ["p1"]
        assert xpath_select(root, "//p[@id='p1']/self::div") == []
        d = parse_dom("<div id='d'><ul><li id='l1'>a</li><li id='l2'>b</li></ul></div>")
        assert _ids(xpath_select(d, "//div/descendant::li")) == ["l1", "l2"]
        assert [n.tag for n in xpath_select(d, "//div/descendant-or-self::*")] == \
            ["div", "ul", "li", "li"]

    def test_following_axis_document_order(self):
        root = parse_dom(EXT_DOC)
        # everything after the span in document order, minus its descendants
        got = xpath_select(root, "//span/following::p")
        assert [n.attrs.get("id") for n in got] == ["p3", "p4", None]
        hrefs = [n.attrs.get("href")
                 for n in xpath_select(root, "//span/following::a")]
        assert hrefs == ["/docs/intro", "/blog/x.html", "https://ext.example/page"]
        # following excludes the context node's own descendants
        assert [n.tag for n in xpath_select(root, "//ul/following::*")] == \
            ["section", "article", "p"]
        # forward axis: [1] = first following in document order
        assert _ids(xpath_select(root, "//span/following::p[1]")) == ["p3"]
        assert extract_by_xpath(EXT_DOC, ["//span/following::p"]) == \
            "gamma\n\ndelta\n\nonly"

    def test_preceding_axis_reverse_positions(self):
        root = parse_dom(EXT_DOC)
        # node-set output is document order ...
        assert _ids(xpath_select(root, "//span/preceding::p")) == ["p1", "p2"]
        # ... but positions count nearest-first (reverse axis)
        assert _ids(xpath_select(root, "//span/preceding::p[1]")) == ["p2"]
        # preceding excludes ancestors (html, body, ul, li here)
        got = xpath_select(root, "//a[@href='/blog/x.html']/preceding::*")
        assert [n.tag for n in got] == \
            ["div", "p", "p", "span", "p", "p", "li", "a"]
        # from the document node both axes are empty
        assert xpath_select(root, "/html/preceding::*") == []

    def test_unsupported_axes_invalid_skip(self):
        for bad in ("//a/namespace::x",):
            assert not validate_xpath(bad)[0], bad
        # attribute:: / @ steps are VALID (select attr-value strings) but the
        # extraction layer drops strings exactly like the reference's
        # itertext AttributeError skip — observable output stays empty
        assert validate_xpath("//a/attribute::href")[0]
        assert extract_by_xpath(EXT_DOC, ["//a/attribute::href"]) == ""

    def test_axis_after_double_slash_applies_from_descendants(self):
        # //following-sibling::x ≡ descendant-or-self::node()/following-sibling::x
        root = parse_dom("<div><a id='a1'>x</a><b id='b1'>y</b></div>")
        assert _ids(xpath_select(root, "//following-sibling::b")) == ["b1"]


class TestAttrCaseFlags:
    """CSS4 attribute case flags [attr=v i] / [attr=v s] (the last selector
    surface VERDICT r2 named)."""

    DOC = ("<div><a id='a1' href='/Docs/INTRO' rel='Nofollow'>x</a>"
           "<a id='a2' href='/docs/intro' rel='nofollow'>y</a></div>")

    def test_i_flag_all_operators(self):
        root = parse_dom(self.DOC)
        assert _ids(css_select(root, "a[rel=NOFOLLOW i]")) == ["a1", "a2"]
        assert _ids(css_select(root, "a[href^='/DOCS' i]")) == ["a1", "a2"]
        assert _ids(css_select(root, "a[href$='intro' i]")) == ["a1", "a2"]
        assert _ids(css_select(root, "a[href*='CS/IN' i]")) == ["a1", "a2"]
        assert _ids(css_select(root, "a[rel~='NoFollow' i]")) == ["a1", "a2"]
        # quoted value + flag
        assert _ids(css_select(root, 'a[rel="NOFOLLOW" i]')) == ["a1", "a2"]

    def test_s_flag_and_default_stay_sensitive(self):
        root = parse_dom(self.DOC)
        assert _ids(css_select(root, "a[rel=nofollow]")) == ["a2"]
        assert _ids(css_select(root, "a[rel=nofollow s]")) == ["a2"]
        assert _ids(css_select(root, "a[rel=Nofollow s]")) == ["a1"]

    def test_flag_without_value_is_invalid(self):
        ok, _ = validate_css_selector("a[rel i]")
        assert not ok


class TestHasAndAttributeSteps:
    """Round-3 session-4 residue: CSS :has(relative selector) and XPath
    attribute steps (@href / attribute::href)."""

    DOC = ("<div id='a'><img src='x'><p>one</p></div>"
           "<div id='b'><p>two</p></div>"
           "<div id='c'><span><img src='y'></span></div>"
           "<section><h2>t</h2><p>after</p></section>")

    def test_has_descendant_child_sibling(self):
        root = parse_dom(self.DOC)
        assert _ids(css_select(root, "div:has(img)")) == ["a", "c"]
        assert _ids(css_select(root, "div:has(> img)")) == ["a"]
        assert _ids(css_select(root, "div:has(+ div)")) == ["a", "b"]
        assert [n.tag for n in css_select(root, "section:has(h2 + p)")] == ["section"]

    def test_has_nested_and_combined(self):
        root = parse_dom(self.DOC)
        assert _ids(css_select(root, "div:has(span:has(> img))")) == ["c"]
        assert _ids(css_select(root, "div:has(p):not(#b)")) == ["a"]
        assert _ids(css_select(root, "div:not(:has(p))")) == ["c"]

    def test_has_invalid_arguments_skip(self):
        assert not validate_css_selector("div:has()")[0]
        assert not validate_css_selector("div:has(> )")[0]
        assert extract_by_css(self.DOC, ["div:has()"]) == ""

    def test_has_extraction(self):
        assert extract_by_css(self.DOC, ["div:has(> img) p"]) == "one"

    def test_attribute_steps_select_value_strings(self):
        root = parse_dom("<div id='top'><a href='/x'>1</a>"
                         "<section id='s1'><a href='/y'>2</a></section></div>")
        assert xpath_select(root, "//a/@href") == ["/x", "/y"]
        assert xpath_select(root, "//a/attribute::href") == ["/x", "/y"]
        assert xpath_select(root, "//section//@href") == ["/y"]
        assert xpath_select(root, "//@id") == ["top", "s1"]

    def test_attribute_steps_dropped_at_extraction_like_reference(self):
        # lxml returns smart strings for @href; the reference's
        # ' '.join(element.itertext()) raises on them and SKIPS (selector_
        # utils.py:158-165) — a mixed union keeps only the element results
        html = "<div><a href='/x'>one</a><p>para</p></div>"
        assert extract_by_xpath(html, ["//a/@href | //p"]) == "para"
        assert extract_by_xpath(html, ["//a/@href"]) == ""

    def test_attribute_step_must_be_final(self):
        assert not validate_xpath("//@href/a")[0]
        assert not validate_xpath("//a/@href[1]")[0]


class TestRound4Extensions:
    """Round-4 selector-tail closure: :not() with complex-selector arguments,
    XPath != / normalize-space() / string-length() / count(), and bs4
    structural-equality exclusion removal (VERDICT r3 next-round #3)."""

    DOC = ("<article><div class='x'><p id='p1'>one</p></div>"
           "<div><p id='p2'>two</p></div></article>"
           "<aside><p id='p3'>three</p></aside>"
           "<p id='p4'>four</p>")

    def test_not_with_descendant_combinator(self):
        root = parse_dom(self.DOC)
        # p not inside an article
        got = _ids(css_select(root, "p:not(article p)"))
        assert got == ["p3", "p4"]

    def test_not_with_child_and_class(self):
        root = parse_dom(self.DOC)
        got = _ids(css_select(root, "p:not(.x > p):not(aside p)"))
        assert got == ["p2", "p4"]

    def test_not_with_sibling_combinator(self):
        root = parse_dom("<ul><li id='a'>1</li><li id='b'>2</li>"
                         "<li id='c'>3</li></ul>")
        assert _ids(css_select(root, "li:not(li + li)")) == ["a"]
        assert _ids(css_select(root, "li:not(#a ~ li)")) == ["a"]

    def test_not_complex_selector_list_mix(self):
        root = parse_dom(self.DOC)
        # list mixing a compound and a complex argument
        got = _ids(css_select(root, "p:not(#p4, aside p)"))
        assert got == ["p1", "p2"]

    def test_not_leading_combinator_still_invalid(self):
        assert not validate_css_selector("p:not(> div)")[0]
        assert not validate_css_selector("p:not(div >)")[0]

    def test_xpath_attr_neq(self):
        root = parse_dom("<div><a id='x' cls='m'>1</a><a id='y' cls='n'>2</a>"
                         "<a id='z'>3</a></div>")
        # node-set !=: absent attribute never matches
        got = xpath_select(root, "//a[@cls!='m']")
        assert [n.attrs["id"] for n in got] == ["y"]

    def test_xpath_text_neq(self):
        root = parse_dom("<div><p id='a'>one</p><p id='b'>two</p>"
                         "<p id='c'></p></div>")
        got = xpath_select(root, "//p[text()!='one']")
        assert [n.attrs["id"] for n in got] == ["b"]

    def test_xpath_normalize_space(self):
        html = ("<div><p id='a'>  hello   world </p>"
                "<p id='b'>hello world</p><p id='c'>other</p></div>")
        root = parse_dom(html)
        got = xpath_select(root, "//p[normalize-space()='hello world']")
        assert [n.attrs["id"] for n in got] == ["a", "b"]
        got = xpath_select(root, "//p[normalize-space(text())='other']")
        assert [n.attrs["id"] for n in got] == ["c"]
        # string(.) concatenates descendants
        root2 = parse_dom("<div id='w'><span> a </span><span>b</span></div>")
        assert xpath_select(root2, "//div[normalize-space()='a b']")

    def test_xpath_normalize_space_attr_and_neq(self):
        root = parse_dom("<div><a id='x' t=' v  1 '>1</a><a id='y' t='v 1'>2</a></div>")
        got = xpath_select(root, "//a[normalize-space(@t)='v 1']")
        assert [n.attrs["id"] for n in got] == ["x", "y"]
        got = xpath_select(root, "//a[normalize-space(@t)!='v 1']")
        assert got == []

    def test_xpath_string_length(self):
        root = parse_dom("<div><p id='a'>abc</p><p id='b'>abcdef</p>"
                         "<p id='c'></p></div>")
        got = xpath_select(root, "//p[string-length() > 3]")
        assert [n.attrs["id"] for n in got] == ["b"]
        got = xpath_select(root, "//p[string-length(text()) = 0]")
        assert [n.attrs["id"] for n in got] == ["c"]
        root2 = parse_dom("<a href='/ab'>x</a><a href='/abcd'>y</a>")
        got = xpath_select(root2, "//a[string-length(@href) >= 4]")
        assert len(got) == 1 and got[0].attrs["href"] == "/abcd"

    def test_xpath_count(self):
        html = ("<ul id='u1'><li>1</li><li>2</li></ul>"
                "<ul id='u2'><li>1</li></ul><ul id='u3'></ul>")
        root = parse_dom(html)
        got = xpath_select(root, "//ul[count(li) = 2]")
        assert [n.attrs["id"] for n in got] == ["u1"]
        got = xpath_select(root, "//ul[count(*) = 0]")
        assert [n.attrs["id"] for n in got] == ["u3"]
        got = xpath_select(root, "//ul[count(li) >= 1]")
        assert [n.attrs["id"] for n in got] == ["u1", "u2"]

    def test_new_predicates_still_invalid_outside_subset(self):
        # unsupported function spellings keep the invalid-skip contract
        assert not validate_xpath("//p[normalize-space(foo())='x']")[0]
        assert not validate_xpath("//p[count(a/b)=1]")[0]
        assert not validate_xpath("//p[string-length(.)=1]")[0]

    def test_css_exclusion_structural_equality(self):
        # two structurally IDENTICAL divs; the exclude matches only the
        # second (scoped via aside), but bs4's list.remove drops the FIRST
        # structurally-equal element — output text is identical either way;
        # this pins the mechanics.
        html = ("<main><div class='k'><p>same</p></div></main>"
                "<aside><div class='k'><p>same</p></div></aside>"
                "<div class='other'><p>keep</p></div>")
        got = extract_by_css(html, ["div.k", "div.other"], ["aside div"])
        # exactly one 'same' copy survives alongside 'keep'
        assert got == "same\n\nkeep"

    def test_template_selectors_unaffected(self):
        # the five templates still parse and extract after the widening
        for tpl in SELECTOR_TEMPLATES.values():
            for s in tpl["css"] + tpl["exclude_css"]:
                assert validate_css_selector(s)[0], s
            for x in tpl["xpath"] + tpl["exclude_xpath"]:
                assert validate_xpath(x)[0], x


class TestIsWhereAndNspFns:
    """Round-4 follow-on residue: :is()/:where()/:matches() and
    contains/starts-with over normalize-space()."""

    DOC = ("<article><p id='p1'>one</p></article>"
           "<aside><p id='p2'>two</p></aside>"
           "<div class='k'><p id='p3'>three</p></div>"
           "<span id='s1'>x</span>")

    def test_is_matches_any_argument(self):
        root = parse_dom(self.DOC)
        got = _ids(css_select(root, ":is(article, aside) p"))
        assert got == ["p1", "p2"]
        got = _ids(css_select(root, "p:is(article p, .k > p)"))
        assert got == ["p1", "p3"]

    def test_where_and_matches_aliases(self):
        root = parse_dom(self.DOC)
        assert _ids(css_select(root, "p:where(aside p)")) == ["p2"]
        assert _ids(css_select(root, "p:matches(#p1, #p3)")) == ["p1", "p3"]

    def test_is_composes_with_not(self):
        root = parse_dom(self.DOC)
        got = _ids(css_select(root, "p:not(:is(article p, aside p))"))
        assert got == ["p3"]

    def test_is_empty_is_invalid(self):
        assert not validate_css_selector("p:is()")[0]
        assert not validate_css_selector("p:where(> p)")[0]

    def test_xpath_contains_normalize_space(self):
        root = parse_dom("<div><p id='a'>  big   deal </p>"
                         "<p id='b'>ordeal</p></div>")
        got = xpath_select(root, "//p[contains(normalize-space(), 'big deal')]")
        assert [n.attrs["id"] for n in got] == ["a"]
        got = xpath_select(root, "//p[starts-with(normalize-space(text()), 'big')]")
        assert [n.attrs["id"] for n in got] == ["a"]

    def test_xpath_nsp_fn_attr_form(self):
        root = parse_dom("<a id='x' t='  v 1 '>.</a><a id='y' t='w 1'>.</a>")
        got = xpath_select(root, "//a[contains(normalize-space(@t), 'v 1')]")
        assert [n.attrs["id"] for n in got] == ["x"]


class TestValidatorTotality:
    """Property: the validators NEVER raise — any string, however mangled,
    maps to (ok, reason). That is the invalid-skip contract the extraction
    layer relies on (an exception escaping validate_* would crash the Arrow
    pass instead of skipping the selector)."""

    def test_css_validator_total_over_fuzz(self):
        from hypothesis import given, settings, strategies as st

        frag = st.sampled_from(
            ["div", "p", "*", ".k", "#i", ">", "+", "~", " ", ",", ":not(",
             ":is(", ":has(", ":nth-child(2n+1", ")", "[a=b", "]", "[a=b i]",
             ":first-child", "::before", "'", '"', "\\", "|", "$", "@", "(",
             ":where(p, div > a)", "article:has(> img)"])

        @settings(max_examples=120, deadline=None)
        @given(st.lists(frag, min_size=0, max_size=8))
        def check(parts):
            sel = "".join(parts)
            ok, reason = validate_css_selector(sel)
            assert isinstance(ok, bool)
            if not ok:
                assert isinstance(reason, str)

        check()

    def test_xpath_validator_total_over_fuzz(self):
        from hypothesis import given, settings, strategies as st

        frag = st.sampled_from(
            ["//", "/", "div", "*", "text()", "@href", "[", "]", "[1]",
             "[last()]", "[@a='v']", "[@a!='v']", "[contains(@a,'v')]",
             "[normalize-space()='x']", "[count(p)=2]", "[string-length()>3]",
             "following-sibling::", "ancestor::", "|", "(", ")", "'", '"',
             "::", "..", "."])

        @settings(max_examples=120, deadline=None)
        @given(st.lists(frag, min_size=0, max_size=8))
        def check(parts):
            expr = "".join(parts)
            ok, reason = validate_xpath(expr)
            assert isinstance(ok, bool)

        check()


class TestEmptyAndRoot:
    def test_empty(self):
        root = parse_dom("<div id='a'></div><div id='b'> </div>"
                         "<div id='c'><span></span></div><br id='d'>")
        got = _ids(css_select(root, "div:empty"))
        assert got == ["a"]  # whitespace text disqualifies b; child disqualifies c
        assert _ids(css_select(root, "br:empty")) == ["d"]  # void tag = empty
        assert _ids(css_select(root, "div:not(:empty)")) == ["b", "c"]

    def test_root(self):
        root = parse_dom("<html><body><p id='p'>x</p></body></html>")
        assert [n.tag for n in css_select(root, ":root")] == ["html"]
        assert css_select(root, "p:root") == []
        # :root composes with descendant combinators
        assert _ids(css_select(root, ":root p")) == ["p"]


class TestNthChildOf:
    DOC = ("<ul><li id='a' class='x'>1</li><li id='b'>2</li>"
           "<li id='c' class='x'>3</li><li id='d'>4</li>"
           "<li id='e' class='x'>5</li></ul>")

    def test_nth_child_of_selector(self):
        root = parse_dom(self.DOC)
        # odd among the .x subset: a (1st of .x), e (3rd of .x)
        got = _ids(css_select(root, "li:nth-child(odd of .x)"))
        assert got == ["a", "e"]
        got = _ids(css_select(root, "li:nth-child(2 of .x)"))
        assert got == ["c"]
        # a non-matching subject never matches
        assert css_select(root, "#b:nth-child(1 of .x)") == []

    def test_nth_last_child_of(self):
        root = parse_dom(self.DOC)
        got = _ids(css_select(root, "li:nth-last-child(1 of .x)"))
        assert got == ["e"]
        got = _ids(css_select(root, ":nth-last-child(2 of li.x)"))
        assert got == ["c"]

    def test_of_with_complex_selector(self):
        html = ("<div><section><p id='p1'>i</p></section>"
                "<p id='p2'>ii</p><p id='p3'>iii</p></div>")
        root = parse_dom(html)
        # of-list with a complex selector: p that are DIRECT children of div
        got = _ids(css_select(root, "p:nth-child(1 of div > p)"))
        assert got == ["p2"]

    def test_of_errors_invalid(self):
        assert not validate_css_selector("li:nth-child(2 of )")[0]
        assert not validate_css_selector("li:nth-child(of .x)")[0]
        # plain nth-child still fine
        assert validate_css_selector("li:nth-child(2n+1)")[0]


class TestXPathExistencePredsAndNot:
    DOC = ("<ul id='u1'><li>1</li></ul><ul id='u2'><p>x</p></ul>"
           "<ul id='u3'></ul>"
           "<p id='pa'>text</p><p id='pb'><b>b</b></p>"
           "<a id='l1' href='/x'>1</a><a id='l2'>2</a>")

    def test_child_element_existence(self):
        root = parse_dom(self.DOC)
        got = xpath_select(root, "//ul[li]")
        assert [n.attrs["id"] for n in got] == ["u1"]
        got = xpath_select(root, "//ul[*]")
        assert [n.attrs["id"] for n in got] == ["u1", "u2"]

    def test_text_node_existence(self):
        root = parse_dom(self.DOC)
        got = xpath_select(root, "//p[text()]")
        # the anonymous <p>x</p> inside u2 also has a text child
        assert [n.attrs.get("id") for n in got] == [None, "pa"]
        got = xpath_select(root, "//p[not(text())]")
        assert [n.attrs.get("id") for n in got] == ["pb"]

    def test_any_attribute(self):
        root = parse_dom("<a id='x' href='/'>1</a><span>2</span>")
        got = xpath_select(root, "//*[@*]")
        assert [n.attrs.get("id") for n in got] == ["x"]

    def test_not_wrapping(self):
        root = parse_dom(self.DOC)
        got = xpath_select(root, "//ul[not(li)]")
        assert [n.attrs["id"] for n in got] == ["u2", "u3"]
        got = xpath_select(root, "//a[not(@href)]")
        assert [n.attrs["id"] for n in got] == ["l2"]
        got = xpath_select(root, "//a[not(not(@href))]")
        assert [n.attrs["id"] for n in got] == ["l1"]

    def test_invalid_forms_still_skip(self):
        # not(position()=N) became SUPPORTED in round 5; these stay outside
        # the subset and must keep the invalid-skip contract
        assert validate_xpath("//ul[not(position()=2)]")[0]
        assert not validate_xpath("//ul[not(position()=last())]")[0]
        assert not validate_xpath("//ul[not(position()+1=2)]")[0]
        assert not validate_xpath("//ul[li/a]")[0]
        assert not validate_xpath("//ul[not()]")[0]


class TestSoupContains:
    DOC = ("<div id='a'><p>alpha beta</p></div>"
           "<div id='b'>gamma <span>delta</span></div>"
           "<div id='c'>epsilon</div>")

    def test_descendant_text(self):
        root = parse_dom(self.DOC)
        got = _ids(css_select(root, "div:-soup-contains('beta')"))
        assert got == ["a"]
        got = _ids(css_select(root, "div:-soup-contains('delta')"))
        assert got == ["b"]

    def test_own_text_only(self):
        root = parse_dom(self.DOC)
        assert _ids(css_select(root, "div:-soup-contains-own('delta')")) == []
        assert _ids(css_select(root, "div:-soup-contains-own('gamma')")) == ["b"]

    def test_any_of_list_and_alias(self):
        root = parse_dom(self.DOC)
        got = _ids(css_select(root, "div:-soup-contains('beta', 'epsilon')"))
        assert got == ["a", "c"]
        assert _ids(css_select(root, "div:contains('epsilon')")) == ["c"]

    def test_case_sensitive_and_invalid(self):
        root = parse_dom(self.DOC)
        assert css_select(root, "div:-soup-contains('BETA')") == []
        assert not validate_css_selector("div:-soup-contains()")[0]


# ---------------------------------------------------------------------------
# Round-5 selector tail (VERDICT r4 #5): positional not(), CSS namespace
# rejection-with-reason, and the adversarial CSS-structural vs
# XPath-identity exclusion divergence matrix.
# ---------------------------------------------------------------------------

class TestNotPositional:
    """Positional forms inside not() — exact XPath 1.0 boolean conversion
    (lxml-verified semantics): not(position() OP N) is positional;
    not(NUMBER) and not(last()) are constant false because not() applies
    boolean() to its argument and boolean(3)=boolean(last())=true."""

    HTML = "<div><p>a</p><p>b</p><p>c</p><p>d</p></div>"

    def _texts(self, expr):
        from crawl4ai_scraper_spark.kernel.selectors import parse_dom, xpath_select
        return ["".join(n.children) for n in xpath_select(parse_dom(self.HTML), expr)]

    def test_not_position_cmp(self):
        assert self._texts("//p[not(position()<=2)]") == ["c", "d"]
        assert self._texts("//p[not(position()>1)]") == ["a"]
        assert self._texts("//p[not(position()=3)]") == ["a", "b", "d"]
        assert self._texts("//p[not(position()!=2)]") == ["b"]

    def test_plain_position_neq(self):
        assert self._texts("//p[position()!=2]") == ["a", "c", "d"]

    def test_not_number_and_last_are_constant_false(self):
        # boolean(3) and boolean(last()) are true for every node → not(...)
        # selects nothing — NOT "everything but the 3rd/last"
        assert self._texts("//p[not(3)]") == []
        assert self._texts("//p[not(last())]") == []

    def test_not_position_on_explicit_axis(self):
        # axis order per context node: following siblings of 'a' beyond the
        # first → c, d
        assert self._texts(
            "//p[1]/following-sibling::p[not(position()=1)]") == ["c", "d"]

    def test_not_position_groups_per_parent(self):
        from crawl4ai_scraper_spark.kernel.selectors import parse_dom, xpath_select
        html = "<div><ul><li>1</li><li>2</li></ul><ul><li>3</li><li>4</li></ul></div>"
        got = ["".join(n.children) for n in
               xpath_select(parse_dom(html), "//li[not(position()=1)]")]
        assert got == ["2", "4"]  # inverted WITHIN each parent group


class TestCssNamespaceRejection:
    def test_namespace_forms_raise_named_reason(self):
        import pytest as _pytest

        from crawl4ai_scraper_spark.kernel.selectors import css_select, parse_dom
        doc = parse_dom("<div><a>x</a></div>")
        for sel in ("ns|a", "*|a", "|a", "svg|circle.cls"):
            with _pytest.raises(ValueError, match="namespace"):
                css_select(doc, sel)

    def test_attr_pipe_eq_still_parses(self):
        # [lang|=en] is the dash-prefix attribute operator, NOT a namespace
        from crawl4ai_scraper_spark.kernel.selectors import css_select, parse_dom
        doc = parse_dom('<p lang="en-US">x</p><p lang="fr">y</p>')
        assert len(css_select(doc, "[lang|=en]")) == 1

    def test_invalid_skip_in_extraction(self):
        # an unsupported namespace selector is SKIPPED (reference invalid-
        # selector semantics), the rest of the list still extracts
        from crawl4ai_scraper_spark.kernel.selectors import extract_by_css
        html = "<div><p>keep</p></div>"
        assert extract_by_css(html, ["svg|circle", "p"]) == "keep"


class TestExclusionDivergenceMatrix:
    """The reference's two exclusion mechanics diverge observably, and ours
    must diverge IDENTICALLY (selector_utils.py:84-99 vs 148-152):

    * CSS removes via bs4 list.remove / ``in`` — STRUCTURAL equality: an
      exclusion matching ONE of two identical twins cascades to remove
      BOTH (each iterated twin tests equal to the matched node; each
      removal drops the first remaining structural twin).
    * XPath removes by lxml object IDENTITY: only the matched node goes.
    * CSS exclusion also fires on DESCENDANT matches (select_one); the
      XPath path only removes nodes that are THEMSELVES in the extracted
      list — a descendant-matching exclusion removes nothing there.
    """

    TWINS = ('<div><p class="x">dup</p><span>mid</span>'
             '<p class="x">dup</p><p>tail</p></div>')

    def test_css_exclusion_cascades_to_both_twins(self):
        from crawl4ai_scraper_spark.kernel.selectors import extract_by_css
        # 'span + p' matches ONLY the second twin as a node — but structural
        # removal drops the first twin while iterating it, then the second
        assert extract_by_css(self.TWINS, ["p"], ["span + p"]) == "tail"

    def test_xpath_same_logical_exclusion_removes_only_the_match(self):
        from crawl4ai_scraper_spark.kernel.selectors import extract_by_xpath
        got = extract_by_xpath(
            self.TWINS, ["//p"], ["//span/following-sibling::p[1]"])
        assert got == "dup\n\ntail"  # first twin SURVIVES (identity removal)

    def test_css_first_twin_exclusion_also_cascades(self):
        from crawl4ai_scraper_spark.kernel.selectors import extract_by_css
        assert extract_by_css(self.TWINS, ["p"], ["div > p:first-child"]) == "tail"

    def test_xpath_first_twin_exclusion_keeps_second(self):
        from crawl4ai_scraper_spark.kernel.selectors import extract_by_xpath
        assert extract_by_xpath(self.TWINS, ["//p"], ["//div/p[1]"]) == "dup\n\ntail"

    def test_unique_element_control_case_agrees(self):
        # no twins → both mechanics drop exactly the matched element
        from crawl4ai_scraper_spark.kernel.selectors import (extract_by_css,
                                                             extract_by_xpath)
        html = "<div><p>a</p><p>b</p><p>c</p></div>"
        assert extract_by_css(html, ["p"], ["p:nth-of-type(2)"]) == "a\n\nc"
        assert extract_by_xpath(html, ["//p"], ["//p[2]"]) == "a\n\nc"

    def test_descendant_exclusion_css_fires_xpath_does_not(self):
        from crawl4ai_scraper_spark.kernel.selectors import (extract_by_css,
                                                             extract_by_xpath)
        html = ("<div><blockquote><em>x</em> q</blockquote>"
                "<blockquote><em>y</em> r</blockquote></div>")
        # CSS: select_one('em') under each blockquote matches → both dropped
        assert extract_by_css(html, ["blockquote"], ["em"]) == ""
        # XPath: //em yields em nodes, none of which IS an extracted
        # blockquote → nothing removed (reference 148-152 identity check).
        # Double space = lxml ' '.join(itertext()) over nodes 'x' and ' q'.
        assert extract_by_xpath(html, ["//blockquote"], ["//em"]) == "x  q\n\ny  r"
