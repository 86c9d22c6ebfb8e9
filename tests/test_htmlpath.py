"""HTML parser + XPath-subset engine tests (crawler_spark.rules.htmlpath)."""

from crawler_spark.rules import core
from crawler_spark.rules.htmlpath import (
    html_visible_text,
    html_xpath_first,
    parse_html,
    xpath_all,
)

DOC = """
<html><head><title>T</title></head><body>
<div id="mainframe">
  <div>first</div>
  <div><div><span>deep</span></div>
    <div class="c1"><a href="/x"><i> 42 </i></a><a href="/y"><i>7</i></a></div>
  </div>
  <p class="p-title">Hello World</p>
  <ul><li>one<li>two<li>three</ul>
  <img src="a.png" alt="x">
</div>
</body></html>
"""


def test_basic_child_and_index():
    assert html_xpath_first(DOC, "/html/body/div/div[1]") == "first"
    assert html_xpath_first(DOC, "//div[@id='mainframe']/div[1]") == "first"


def test_jd_shaped_path():
    # mirrors example/jd/main.go:116-125 shape
    v = html_xpath_first(DOC, '//*[@id="mainframe"]/div[2]/div[2]/a[1]/i')
    assert v == " 42 "
    v2 = html_xpath_first(DOC, '//*[@id="mainframe"]/div[2]/div[2]/a[2]/i')
    assert v2 == "7"


def test_string_value_concatenates_descendant_text():
    assert html_xpath_first(DOC, "//div[@class='c1']") == " 42 7"


def test_attribute_selection():
    assert html_xpath_first(DOC, "//a[1]/@href") == "/x"
    assert html_xpath_first(DOC, "//img/@alt") == "x"


def test_predicates():
    assert html_xpath_first(DOC, "//p[@class='p-title']") == "Hello World"
    assert html_xpath_first(DOC, "//div[contains(@class, 'c')]") == " 42 7"
    assert html_xpath_first(DOC, "//li[2]") == "two"
    assert html_xpath_first(DOC, "//li[last()]") == "three"
    assert html_xpath_first(DOC, "//div[a]/a[2]") == "7"
    assert html_xpath_first(DOC, "//p[not(@class)]") is None


def test_implied_li_close():
    root = parse_html(DOC)
    lis = xpath_all(root, "//ul/li")
    assert [n.string_value() for n in lis] == ["one", "two", "three"]


def test_no_match_and_bad_path():
    assert html_xpath_first(DOC, "//nosuch") is None
    assert core.xpath_get_first(DOC, "//nosuch") == ""
    assert core.xpath_get(DOC, "//nosuch") == []


def test_fragment_gets_html_body():
    frag = "<div id='a'>x</div>"
    assert html_xpath_first(frag, "/html/body/div[@id='a']") == "x"
    # head elements hoisted
    frag2 = "<title>t</title><div>b</div>"
    assert html_xpath_first(frag2, "/html/head/title") == "t"
    assert html_xpath_first(frag2, "/html/body/div") == "b"


def test_descendant_excludes_self():
    root = parse_html("<div id='outer'><div id='inner'>x</div></div>")
    outer = xpath_all(root, "//div[@id='outer']")[0]
    # .//div from outer must NOT include outer itself
    inner = xpath_all(outer, ".//div")
    assert [n.attrs.get("id") for n in inner] == ["inner"]


def test_document_order_first_match():
    doc = "<div><b>1</b></div><div><b>2</b></div>"
    assert html_xpath_first(doc, "//b") == "1"


def test_entities_decoded():
    assert html_xpath_first("<p>a &amp; b</p>", "//p") == "a & b"


def test_visible_text():
    t = html_visible_text(
        "<html><body><p> Hello   <b>World</b></p><script>var x=1;</script></body></html>"
    )
    assert t == "Hello World"


def test_xpath_rule_trans():
    out = core.xpath_get_first(DOC, '//*[@id="mainframe"]/div[2]/div[2]/a[1]/i', str.strip)
    assert out == "42"
