"""Pure-Python kernel tests: hand-written quirk cases + hypothesis.

These pin the reference semantics (ruler/*.go) before any Spark involvement.
"""

import re

from hypothesis import given, settings, strategies as st

from crawler_spark.rules import core


# --- cut rule quirks (ruler/cut_string.go) ---------------------------------

def test_cut_first_basic():
    assert core.cut_get_first("x<a>hello</a>y", "<a>", "</a>") == "hello"


def test_cut_first_end_searched_from_zero():
    # `end` occurs BEFORE `start`: Go searches end from position 0 → e <= s → ""
    assert core.cut_get_first("</a>zzz<a>hello</a>", "<a>", "</a>") == ""


def test_cut_first_no_start_or_end():
    assert core.cut_get_first("nothing here", "<a>", "</a>") == ""
    assert core.cut_get_first("<a>unclosed", "<a>", "</a>") == ""


def test_cut_first_trans_only_on_match():
    t = lambda s: s.upper()
    assert core.cut_get_first("<a>hi</a>", "<a>", "</a>", t) == "HI"
    assert core.cut_get_first("none", "<a>", "</a>", t) == ""


def test_cut_get_multi():
    assert core.cut_get("(a)(b)(c)", "(", ")") == ["a", "b", "c"]


def test_cut_get_match_at_very_end_rejected():
    # ei >= len(content) guard: a match whose end delimiter ends exactly at
    # the content end is KEPT only if ei (end of delimiter) < len? Go checks
    # ei (index of end start) < len(content) before slicing → "(c)" final
    # match IS returned; the guard rejects only matches where the end marker
    # position reaches/passes the end -- i.e. never for found markers; but
    # recursion stops when the remainder is empty.
    assert core.cut_get("(a)(b", "(", ")") == ["a"]


def test_cut_get_cross_level_duplicates_survive_distinct():
    # head duplicate survives, per-level tail dedup applies (cut_string.go:51-58)
    assert core.cut_get("(a)(a)", "(", ")", distinct=True) == ["a", "a"]
    assert core.cut_get("(a)(b)(a)(b)", "(", ")", distinct=True) == ["a", "b", "a"]
    assert core.cut_get("(a)(b)(b)(a)", "(", ")", distinct=True) == ["a", "b", "a"]


def test_cut_get_nondistinct_keeps_all():
    assert core.cut_get("(a)(a)(a)", "(", ")") == ["a", "a", "a"]


def test_cut_get_end_before_start_stops_level():
    # level content ") x (v)" → end found at 0 < start → ei <= si → stop
    assert core.cut_get(")(v)", "(", ")") == []
    # first level fine, second level has end-before-start
    assert core.cut_get("(a))(b)", "(", ")") == ["a"]


def _go_cut_get(content, start, end, distinct):
    """Direct recursive transliteration of ruler/cut_string.go:20-60."""
    result = []
    si = content.find(start)
    if si == -1:
        return result
    si += len(start)
    ei = content.find(end)
    if ei == -1:
        return result
    if ei <= si or ei >= len(content):
        return result
    match = content[si:ei]
    if match == "":
        return result
    result.append(match)
    ei += len(end)
    if ei >= len(content):
        return result
    subs = _go_cut_get(content[ei:], start, end, distinct)
    if not distinct:
        return result + subs
    dup = set()
    for s in subs:
        if s in dup:
            continue
        dup.add(s)
        result.append(s)
    return result


@settings(max_examples=300, deadline=None)
@given(
    content=st.text(alphabet="ab()<>x", max_size=60),
    distinct=st.booleans(),
)
def test_cut_get_iterative_equals_recursive(content, distinct):
    assert core.cut_get(content, "(", ")", distinct) == _go_cut_get(
        content, "(", ")", distinct
    )


@settings(max_examples=200, deadline=None)
@given(
    content=st.text(alphabet="abcSE|", max_size=80),
    start=st.sampled_from(["S", "SS", "S|"]),
    end=st.sampled_from(["E", "EE", "|E"]),
    distinct=st.booleans(),
)
def test_cut_get_iterative_equals_recursive_multi(content, start, end, distinct):
    assert core.cut_get(content, start, end, distinct) == _go_cut_get(
        content, start, end, distinct
    )


# --- regex rule (ruler/regex_string.go) -------------------------------------

def test_regex_first_empty_on_no_match_with_trans():
    # trans applied even to the empty no-match result (regex_string.go:41-45)
    t = lambda s: f"[{s}]"
    assert core.regex_get_first("abc", r"[0-9]+", t) == "[]"
    assert core.regex_get_first("a12b", r"[0-9]+", t) == "[12]"


def test_regex_get_distinct_order_and_trans_after_dedup():
    calls = []

    def t(s):
        calls.append(s)
        return s + "!"

    out = core.regex_get("b1 a2 b1 c3 a2", r"[a-z][0-9]", distinct=True, trans=t)
    assert out == ["b1!", "a2!", "c3!"]
    assert calls == ["b1", "a2", "c3"]  # transform AFTER dedup


def test_regex_get_nondistinct():
    assert core.regex_get("1 2 1", r"[0-9]") == ["1", "2", "1"]


# --- noop / const ------------------------------------------------------------

def test_noop_and_const():
    assert core.noop_get_first("x", lambda s: s * 2) == "xx"
    assert core.noop_get("x") == ["x"]
    assert core.const_get_first("k") == "k"
    assert core.const_get("k", trans=lambda s: s.upper()) == ["K"]


# --- sanity: python re behaves leftmost-first like Go for our pattern class --

def test_leftmost_first_reference_patterns():
    pat = r'<a href="/project/details/[0-9]+.html"'
    s = 'zz<a href="/project/details/12.html" more <a href="/project/details/345.html"'
    assert [m.group(0) for m in re.finditer(pat, s)] == [
        '<a href="/project/details/12.html"',
        '<a href="/project/details/345.html"',
    ]
