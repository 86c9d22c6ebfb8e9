"""Pure-Python rule kernels — the semantic ground truth.

These functions are a line-for-line behavioural port of the reference
extraction rules (songshine/crawler `ruler/` package, see
/root/reference/ruler/*.go). They are used in two places:

1. the pure-Python oracle crawler (tests compare Spark output against it),
2. inside Arrow-vectorized pandas UDFs (crawler_spark.rules.spark) for the
   rules whose quirks cannot be reproduced with Spark built-ins.

Reference quirks preserved on purpose (cited file:line):

* cut GetFirst searches ``end`` from position 0 of the content, NOT after
  ``start`` — if the first ``end`` occurs at/before the end of ``start``,
  the result is "" (ruler/cut_string.go:62-73).
* cut Get recurses on the remainder after ``end`` and, when distinct=True,
  dedups ONLY each recursion level's tail among itself — duplicates between
  the level head and deeper levels survive (ruler/cut_string.go:20-60).
* cut Get rejects a match whose ``end`` delimiter ends exactly at the end
  of the content (the ``ei >= len(content)`` guard, ruler/cut_string.go:33).
* regex Get with distinct=True dedups RAW matches globally in first-
  occurrence order, applying the transform AFTER dedup
  (ruler/regex_string.go:19-39).
* xpath Get wraps GetFirst: at most one element, dropped when ""
  (ruler/xpath_node.go:25-31).

Transforms are ``Callable[[str], str] | None`` exactly like the Go
``transStringFunc`` (ruler/ruler.go:20-40): ``None`` means identity.
"""

from __future__ import annotations

import re
from collections.abc import Callable

TransFunc = Callable[[str], str] | None


def apply_trans(trans: TransFunc, s: str) -> str:
    """ruler/ruler.go:22-28 — nil-safe scalar transform."""
    return trans(s) if trans is not None else s


def apply_trans_slice(trans: TransFunc, ss: list[str]) -> list[str]:
    """ruler/ruler.go:30-40 — nil-safe per-element transform."""
    return [trans(s) for s in ss] if trans is not None else ss


# ---------------------------------------------------------------------------
# const rule — ruler/const_string.go
# ---------------------------------------------------------------------------

def const_get_first(cons: str, trans: TransFunc = None) -> str:
    return apply_trans(trans, cons)


def const_get(cons: str, distinct: bool = False, trans: TransFunc = None) -> list[str]:
    return apply_trans_slice(trans, [cons])


# ---------------------------------------------------------------------------
# noop rule — ruler/ruler.go:8-18
# ---------------------------------------------------------------------------

def noop_get_first(content: str, trans: TransFunc = None) -> str:
    return apply_trans(trans, content)


def noop_get(content: str, distinct: bool = False, trans: TransFunc = None) -> list[str]:
    return [apply_trans(trans, content)]


# ---------------------------------------------------------------------------
# cut rule — ruler/cut_string.go
# ---------------------------------------------------------------------------

def cut_get_first(content: str, start: str, end: str, trans: TransFunc = None) -> str:
    """ruler/cut_string.go:62-73. NOTE: ``end`` is searched from position 0."""
    s = content.find(start)
    if s == -1:
        return ""
    s += len(start)
    e = content.find(end)
    if e > s and e < len(content):
        return apply_trans(trans, content[s:e])
    return ""


def _cut_raw_matches(content: str, start: str, end: str) -> list[str]:
    """Iterative equivalent of the recursion in ruler/cut_string.go:20-47.

    Each 'level' of the Go recursion operates on the remainder after the
    previous match's ``end`` delimiter; within a level both ``start`` and
    ``end`` are searched from the level's position 0. Offset-based to stay
    O(n) instead of slicing the content per level.
    """
    out: list[str] = []
    base = 0
    n = len(content)
    while True:
        si = content.find(start, base)
        if si == -1:
            return out
        si += len(start)
        ei = content.find(end, base)
        if ei == -1:
            return out
        # level-relative guards (ruler/cut_string.go:33): ei <= si or match
        # running to the very end of the level content are both rejected.
        if ei <= si or ei >= n:
            return out
        match = content[si:ei]
        if match == "":  # unreachable given ei > si; kept for fidelity (:38-40)
            return out
        out.append(match)
        ei += len(end)
        if ei >= n:  # ruler/cut_string.go:43-45
            return out
        base = ei


def cut_get(
    content: str, start: str, end: str, distinct: bool = False, trans: TransFunc = None
) -> list[str]:
    """ruler/cut_string.go:20-60, incl. the per-level distinct quirk.

    The Go code computes ``result = [head] + dedup(recurse(tail))`` at every
    level, where dedup keeps first occurrences. Unrolled: with raw matches
    m1..mn (transform applied as each head is appended, :41), the returned
    list is ``[t(m1)] + D2`` where ``D_k = dedup([t(mk)] + D_{k+1})`` — so a
    value equal to t(m1) can legitimately appear twice in the result.
    """
    matches = _cut_raw_matches(content, start, end)
    if not matches:
        return []
    transformed = apply_trans_slice(trans, matches)
    if not distinct:
        return list(transformed)
    acc: list[str] = []  # D_{n+1}
    for m in reversed(transformed[1:]):
        # dedup_first([m] + acc); acc is already internally unique
        acc = [m] + [x for x in acc if x != m]
    return [transformed[0]] + acc


# ---------------------------------------------------------------------------
# regex rule — ruler/regex_string.go
#
# Go uses RE2; Python `re` is backtracking but both are leftmost-first for
# the pattern class used here (no backreferences / lookaround in RE2, so any
# RE2-valid pattern is also a valid Python pattern with the same first-match
# semantics on our corpora). Compiled once per (pattern) via lru-style cache
# — deliberately fixing the reference's recompile-per-call perf bug
# (ruler/regex_string.go:20,42) with identical output.
# ---------------------------------------------------------------------------

_REGEX_CACHE: dict[str, re.Pattern[str]] = {}


def _compiled(pattern: str) -> re.Pattern[str]:
    rex = _REGEX_CACHE.get(pattern)
    if rex is None:
        rex = re.compile(pattern)
        if len(_REGEX_CACHE) > 4096:
            _REGEX_CACHE.clear()
        _REGEX_CACHE[pattern] = rex
    return rex


def regex_get_first(content: str, pattern: str, trans: TransFunc = None) -> str:
    """ruler/regex_string.go:41-45 — first match, "" when none (Go FindString)."""
    m = _compiled(pattern).search(content)
    return apply_trans(trans, m.group(0) if m else "")


def regex_get(
    content: str, pattern: str, distinct: bool = False, trans: TransFunc = None
) -> list[str]:
    """ruler/regex_string.go:19-39 — all matches; distinct dedups RAW matches
    in first-occurrence order, transform applied AFTER dedup."""
    matches = [m.group(0) for m in _compiled(pattern).finditer(content)]
    if not distinct:
        return apply_trans_slice(trans, matches)
    seen: set[str] = set()
    result: list[str] = []
    for m in matches:
        if m in seen:
            continue
        seen.add(m)
        result.append(m)
    return apply_trans_slice(trans, result)


# ---------------------------------------------------------------------------
# xpath rule — ruler/xpath_node.go (engine in crawler_spark.rules.htmlpath)
# ---------------------------------------------------------------------------

def xpath_get_first(content: str, xpath: str, trans: TransFunc = None) -> str:
    """ruler/xpath_node.go:33-60 — parse HTML, evaluate path, string-value of
    the FIRST matched node (concat of descendant text,
    vendor/.../xmlpath/parser.go:45-60); "" on no match / parse failure."""
    from crawler_spark.rules.htmlpath import html_xpath_first

    value = html_xpath_first(content, xpath)
    if value is None:
        return ""
    return apply_trans(trans, value)


def xpath_get(
    content: str, xpath: str, distinct: bool = False, trans: TransFunc = None
) -> list[str]:
    """ruler/xpath_node.go:25-31 — at most one element, dropped when ''."""
    val = xpath_get_first(content, xpath, trans)
    return [val] if val != "" else []
