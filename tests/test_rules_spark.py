"""Spark Column expressions == pure-Python oracle, element for element."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.rules import ConstRule, CutRule, NoopRule, RegexRule, Trans, XPathRule, xpath_struct_expr

CONTENTS = [
    "",
    "plain text, no markers",
    "x<a>hello</a>y",
    "</a>zz<a>h</a>",  # end before start → "" (cut quirk)
    "(a)(b)(c)",
    "(a)(a)",
    "(a)(b)(a)(b)",
    "(a))(b)",
    "nums 12 and 345 and 12 again",
    "<a>unclosed",
    "end at very end<a>v</a>",
    "<a></a>",  # empty match
    "多字节 ￥<span>12</span> 文本 ￥<span>9</span>",
    "<p class=\"p-title\">标题</p> rest",
]

UPPER = Trans(py=str.upper, col=F.upper)
BRACKET = Trans(py=lambda s: f"[{s}]", col=lambda c: F.concat(F.lit("["), c, F.lit("]")))


def _run(spark, expr_builder, contents=CONTENTS):
    df = spark.createDataFrame([(c,) for c in contents], ["html"])
    return [r[0] for r in df.select(expr_builder(F.col("html"))).collect()]


@pytest.mark.parametrize("trans", [None, UPPER, BRACKET])
def test_cut_first_builtin_matches_oracle(spark, trans):
    rule = CutRule("<a>", "</a>", trans)
    got = _run(spark, rule.first_expr)
    want = [rule.get_first(c) for c in CONTENTS]
    assert got == want


@pytest.mark.parametrize("start,end", [("(", ")"), ("￥<span>", "</span>"), ("<a>", "</a>")])
@pytest.mark.parametrize("distinct", [False, True])
def test_cut_array_udf_matches_oracle(spark, start, end, distinct):
    rule = CutRule(start, end)
    got = _run(spark, lambda c: rule.array_expr(c, distinct))
    want = [rule.get(c, distinct) for c in CONTENTS]
    assert got == want


@pytest.mark.parametrize("trans", [None, BRACKET])
def test_regex_first_builtin_matches_oracle(spark, trans):
    rule = RegexRule(r"[0-9]+", trans)
    got = _run(spark, rule.first_expr)
    want = [rule.get_first(c) for c in CONTENTS]
    assert got == want


@pytest.mark.parametrize("distinct", [False, True])
@pytest.mark.parametrize("trans", [None, BRACKET])
def test_regex_array_builtin_matches_oracle(spark, distinct, trans):
    rule = RegexRule(r"[0-9]+", trans)
    got = _run(spark, lambda c: rule.array_expr(c, distinct))
    want = [rule.get(c, distinct) for c in CONTENTS]
    assert got == want


def test_regex_jd_pattern(spark):
    pat = r'<a href="/project/details/[0-9]+.html"'
    contents = [
        'x<a href="/project/details/12.html" y <a href="/project/details/345.html" '
        '<a href="/project/details/12.html"',
        "none",
    ]
    rule = RegexRule(pat)
    got = _run(spark, lambda c: rule.array_expr(c, True), contents)
    want = [rule.get(c, True) for c in contents]
    assert got == want
    assert want[0] == [
        '<a href="/project/details/12.html"',
        '<a href="/project/details/345.html"',
    ]


def test_const_and_noop(spark):
    crule = ConstRule("公益", UPPER)
    nrule = NoopRule(BRACKET)
    got_c = _run(spark, crule.first_expr, ["anything"])
    got_n = _run(spark, nrule.first_expr, ["anything"])
    assert got_c == [crule.get_first("anything")]
    assert got_n == [nrule.get_first("anything")] == ["[anything]"]


DOC = (
    '<html><body><div id="mainframe"><div>a</div>'
    '<div><div>x</div><div class="k"><a href="u"><i> 9 </i></a><a><i>3</i></a></div></div>'
    "</div></body></html>"
)


def test_xpath_udf_matches_oracle(spark):
    rule = XPathRule('//*[@id="mainframe"]/div[2]/div[2]/a[1]/i', Trans(py=str.strip))
    contents = [DOC, "<p>no</p>", ""]
    got = _run(spark, rule.first_expr, contents)
    want = [rule.get_first(c) for c in contents]
    assert got == want
    assert want[0] == "9"


def test_xpath_struct_single_parse(spark):
    rules = {
        "a1": XPathRule('//*[@id="mainframe"]/div[2]/div[2]/a[1]/i', Trans(py=str.strip)),
        "a2": XPathRule('//*[@id="mainframe"]/div[2]/div[2]/a[2]/i', Trans(py=str.strip)),
        "missing": XPathRule("//nosuch"),
    }
    df = spark.createDataFrame([(DOC,)], ["html"])
    row = df.select(xpath_struct_expr(F.col("html"), rules).alias("s")).collect()[0]["s"]
    assert (row["a1"], row["a2"], row["missing"]) == ("9", "3", "")
    for name, r in rules.items():
        assert row[name] == r.get_first(DOC)


def test_binary_html_column(spark):
    df = spark.createDataFrame([(DOC.encode("utf-8"),)], "html binary")
    rule = CutRule('<div id="mainframe"><div>', "</div>")
    got = [r[0] for r in df.select(rule.first_expr(F.col("html"))).collect()]
    assert got == [rule.get_first(DOC)] == ["a"]
