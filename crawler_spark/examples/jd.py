"""The jd crowdfunding workload — port of /root/reference/example/jd/main.go.

Field-for-field reproduction of the 8-column collector (main.go:44-144,
177-183), with English column names. Lives in the package (not tests) so
pandas-UDF closures referencing these transforms resolve on executors.
"""

from __future__ import annotations

from crawler_spark.collector import Field, FollowUp
from crawler_spark.rules import ConstRule, CutRule, RegexRule, Trans, XPathRule
from crawler_spark.rules import core

JD_FUNDER_URL_FMT = "https://z.example/funderCenter.action?flag=2&id={}"

PRICE_START = "<!--price-box-->"
PRICE_END = "<!--price-box end-->"
TIER_START = "<!-- 档位 -->"
TIER_END = "<!--price-box无私奉献-->"
IMG_START = "<!--图片部分-->"
IMG_END = "<!--图片部分end-->"

_FUNDER_XPATH = '//*[@id="mainframe"]/div[2]/div[1]/div[1]/div[2]/a[{}]/i'


def count_price_boxes(s: str) -> str:
    """main.go:58-62: strconv.Itoa(strings.Count(s, "<!--price-box-->"))."""
    return str(s.count(PRICE_START))


def min_price(s: str) -> str:
    """main.go:66-98: nested cut over price boxes, lottery-tier guard,
    min over parseable ints ("0" when none parse)."""

    def inner(tier: str) -> str:
        if "抽奖档" in tier:  # main.go:74-76
            return ""
        return core.cut_get_first(tier, "￥<span>", "</span>").strip()

    prices = core.cut_get(s, PRICE_START, PRICE_END, distinct=False, trans=inner)
    lowest, found = 0, False
    for p in prices:
        try:
            pi = int(p)
        except ValueError:
            continue
        if not found or pi < lowest:
            found, lowest = True, pi
    return str(lowest)


def count_imgs(s: str) -> str:
    """main.go:102-107."""
    return str(s.count("<img alt"))


def jd_fields(category_name: str) -> list[Field]:
    """The 8 fields of main.go:177-183 + buildFieldRules()."""
    return [
        Field("category", ConstRule(category_name)),
        Field("project_id", RegexRule("[0-9]+"), from_url=True),
        Field("title", CutRule('<p class="p-title">', "</p>")),
        Field("n_tiers", CutRule(TIER_START, TIER_END, Trans(py=count_price_boxes))),
        Field("min_price", CutRule(TIER_START, TIER_END, Trans(py=min_price))),
        Field("n_images", CutRule(IMG_START, IMG_END, Trans(py=count_imgs))),
        Field(
            "funder_supported",
            RegexRule("[0-9]+"),
            from_url=True,
            follow_up=FollowUp(
                JD_FUNDER_URL_FMT,
                XPathRule(_FUNDER_XPATH.format(1), Trans(py=str.strip)),
            ),
        ),
        Field(
            "funder_started",
            RegexRule("[0-9]+"),
            from_url=True,
            follow_up=FollowUp(
                JD_FUNDER_URL_FMT,
                XPathRule(_FUNDER_XPATH.format(2), Trans(py=str.strip)),
            ),
        ),
    ]


def oracle_row(url: str, html: str, corpus: dict[str, str], category_name: str) -> dict:
    """Pure-Python ground truth for one detail page (test oracle)."""
    pid = core.regex_get_first(url, "[0-9]+")
    fu_html = corpus.get(JD_FUNDER_URL_FMT.format(pid))

    def fu(idx: int) -> str:
        if fu_html is None:
            return ""
        return core.xpath_get_first(fu_html, _FUNDER_XPATH.format(idx), str.strip)

    return {
        "category": category_name,
        "project_id": pid,
        "title": core.cut_get_first(html, '<p class="p-title">', "</p>"),
        "n_tiers": core.cut_get_first(html, TIER_START, TIER_END, count_price_boxes),
        "min_price": core.cut_get_first(html, TIER_START, TIER_END, min_price),
        "n_images": core.cut_get_first(html, IMG_START, IMG_END, count_imgs),
        "funder_supported": fu(1),
        "funder_started": fu(2),
    }
