"""Stdlib-only HTML tree + XPath-subset engine.

Replaces the reference's vendored ``go-xmlpath/xmlpath`` engine
(/root/reference/vendor/.../xmlpath/{doc,parser,path}.go) and the
``x/net/html`` parse step (/root/reference/ruler/xpath_node.go:33-48).
lxml is not available in this environment, so this module implements:

* a tolerant HTML parser (``html.parser.HTMLParser``) producing an element
  tree normalized to the html>head>body shape that ``x/net/html.Parse``
  guarantees (fragments get an implicit html/head/body);
* an XPath-subset evaluator covering the abbreviated syntax the vendored
  engine documents (vendor/.../xmlpath/doc.go:10-20): ``/``, ``//``, ``*``,
  name tests, ``@attr``, ``.``, ``..``, ``text()``, and predicates
  ``[N]``, ``[@a]``, ``[@a="v"]``, ``[path]``, ``[path="v"]``,
  ``[text()="v"]``, ``[contains(x, "v")]``, ``[not(p)]``, ``and``/``or``;
* XPath *string-value* semantics: the value of an element node is the
  concatenation of all descendant text nodes in document order
  (vendor/.../xmlpath/parser.go:45-60); first match = smallest document
  order (vendor/.../xmlpath/path.go:41-47).

Explicit axes (``child::`` etc.) are not implemented — the reference's
example workload (/root/reference/example/jd/main.go:116-141) and our
fixtures use abbreviated syntax only.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# elements whose open tag implicitly closes a same-tag ancestor
_SELF_CLOSING_SIBLINGS = frozenset("p li tr td th option dt dd".split())
_HEAD_ELEMENTS = frozenset("title meta link base style script".split())

TEXT = 0
ELEMENT = 1
DOCUMENT = 2


class Node:
    __slots__ = ("kind", "tag", "attrs", "children", "parent", "data", "ord")

    def __init__(self, kind: int, tag: str = "", attrs: dict | None = None, data: str = ""):
        self.kind = kind
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.data = data
        self.ord = 0

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    # XPath string-value (concat of descendant text, document order)
    def string_value(self) -> str:
        if self.kind == TEXT:
            return self.data
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.kind == TEXT:
                parts.append(n.data)
            else:
                stack.extend(reversed(n.children))
        return "".join(parts)

    def iter_descendants(self):
        """self + all descendants, document order."""
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.children))


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack = [self.root]

    def _open(self, tag: str, attrs) -> Node:
        if tag in _SELF_CLOSING_SIBLINGS:
            for i in range(len(self.stack) - 1, 0, -1):
                anc = self.stack[i]
                if anc.kind == ELEMENT and anc.tag == tag:
                    del self.stack[i:]
                    break
        node = Node(ELEMENT, tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)
        return node

    def handle_starttag(self, tag, attrs):
        node = self._open(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].kind == ELEMENT and self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (tolerant, like x/net/html)

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node(TEXT, data=data))


def _normalize(root: Node) -> Node:
    """Impose the html>head>body document shape of x/net/html.Parse."""
    html_el = next(
        (c for c in root.children if c.kind == ELEMENT and c.tag == "html"), None
    )
    if html_el is None:
        html_el = Node(ELEMENT, "html")
        orphans = root.children
        root.children = []
        root.append(html_el)
    else:
        orphans = [c for c in root.children if c is not html_el]
        root.children = [html_el]
        html_el.parent = root

    head = next(
        (c for c in html_el.children if c.kind == ELEMENT and c.tag == "head"), None
    )
    body = next(
        (c for c in html_el.children if c.kind == ELEMENT and c.tag == "body"), None
    )
    loose = [c for c in html_el.children if c is not head and c is not body] + orphans
    if head is None:
        head = Node(ELEMENT, "head")
    if body is None:
        body = Node(ELEMENT, "body")
    html_el.children = []
    html_el.append(head)
    html_el.append(body)

    in_head = True
    for c in loose:
        if c.kind == ELEMENT and c.tag in _HEAD_ELEMENTS and in_head:
            head.append(c)
        else:
            if c.kind == ELEMENT or c.data.strip():
                in_head = False
            body.append(c)

    for i, n in enumerate(root.iter_descendants()):
        n.ord = i
    return root


def parse_html(content: str) -> Node | None:
    """Parse HTML into a normalized document node; None on hard failure."""
    try:
        builder = _TreeBuilder()
        builder.feed(content)
        builder.close()
        return _normalize(builder.root)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# XPath subset
# ---------------------------------------------------------------------------

class XPathError(ValueError):
    pass


def _split_steps(path: str) -> list[tuple[bool, str]]:
    """Split an abbreviated XPath into (descendant?, step) pairs."""
    steps: list[tuple[bool, str]] = []
    i, n = 0, len(path)
    if i < n and path[i] == "/":
        if path.startswith("//"):
            pass  # handled in loop
        # absolute: evaluation starts at document node either way
    first = True
    while i < n:
        desc = False
        if path.startswith("//", i):
            desc = True
            i += 2
        elif path[i] == "/":
            i += 1
        elif not first:
            raise XPathError(f"bad path near {path[i:]!r}")
        first = False
        # consume one step: up to next '/' not inside brackets/quotes
        j = i
        depth = 0
        quote = ""
        while j < n:
            ch = path[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "\"'":
                quote = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "/" and depth == 0:
                break
            j += 1
        step = path[i:j]
        if step == "" and desc:
            raise XPathError("path ends with //")
        if step:
            steps.append((desc, step))
        i = j
    if not steps:
        raise XPathError(f"empty path {path!r}")
    return steps


_PRED_SPLIT_RE = re.compile(r"^([^\[\]]*)((?:\[[^\[\]]*\])*)$")


def _parse_step(step: str) -> tuple[str, list[str]]:
    m = _PRED_SPLIT_RE.match(step)
    if not m:
        raise XPathError(f"bad step {step!r}")
    test = m.group(1)
    preds = re.findall(r"\[([^\[\]]*)\]", m.group(2))
    return test, preds


def _node_test(nodes: list[Node], test: str, desc: bool) -> list[list[Node]]:
    """Apply a node test per context node; returns per-context result lists
    (grouping is required for positional predicates)."""
    out: list[list[Node]] = []
    for ctx in nodes:
        if test == ".":
            out.append([ctx])
            continue
        if test == "..":
            out.append([ctx.parent] if ctx.parent is not None else [])
            continue
        if desc:
            # ``//x`` ≡ descendant-or-self::node()/child::x → all strict
            # descendants; attributes additionally cover self (see below).
            pool_with_self = list(ctx.iter_descendants())
            pool = pool_with_self[1:]
        else:
            pool_with_self = [ctx]
            pool = ctx.children
        if test == "text()":
            sel = [n for n in pool if n.kind == TEXT]
        elif test == "node()":
            sel = list(pool)
        elif test.startswith("@"):
            # attribute pseudo-nodes represented as (element, attrname) via AttrNode
            name = test[1:]
            sel = []
            for n in pool_with_self:
                if n.kind == ELEMENT:
                    if name == "*":
                        sel.extend(AttrNode(n, k) for k in n.attrs)
                    elif name in n.attrs:
                        sel.append(AttrNode(n, name))
        elif test == "*":
            sel = [n for n in pool if n.kind == ELEMENT]
        else:
            sel = [n for n in pool if n.kind == ELEMENT and n.tag == test]
        out.append(sel)
    return out


class AttrNode:
    """Attribute pseudo-node (string-value = attribute value)."""

    __slots__ = ("owner", "name")

    def __init__(self, owner: Node, name: str):
        self.owner = owner
        self.name = name

    @property
    def kind(self):  # attribute
        return 3

    @property
    def ord(self):
        return self.owner.ord

    def string_value(self) -> str:
        return self.owner.attrs.get(self.name, "")


_CONTAINS_RE = re.compile(r"^contains\(\s*(.+?)\s*,\s*(\"[^\"]*\"|'[^']*')\s*\)$")
_NOT_RE = re.compile(r"^not\(\s*(.+)\s*\)$")
_CMP_RE = re.compile(r"^(.+?)\s*=\s*(\"[^\"]*\"|'[^']*')$")


def _operand_values(node: Node, expr: str) -> list[str]:
    """Evaluate a predicate operand (relative path / @attr / text()) to the
    string-values of its result set."""
    try:
        res = _evaluate(_split_steps(expr), [node])
    except XPathError:
        return []
    return [n.string_value() for n in res]


def _eval_predicate(pred: str, node: Node, pos: int, size: int) -> bool:
    pred = pred.strip()
    # and / or (left-assoc, no parens support beyond not(...))
    for op, fn in ((" or ", any), (" and ", all)):
        depth = 0
        quote = ""
        k = pred.find(op)
        while k != -1:
            # ensure split point not inside quotes/parens
            seg = pred[:k]
            if seg.count("(") == seg.count(")") and seg.count('"') % 2 == 0 and seg.count("'") % 2 == 0:
                parts = [pred[:k], pred[k + len(op):]]
                return fn(_eval_predicate(p, node, pos, size) for p in parts)
            k = pred.find(op, k + 1)
        _ = depth, quote
    m = _NOT_RE.match(pred)
    if m:
        return not _eval_predicate(m.group(1), node, pos, size)
    if pred.isdigit():
        return pos == int(pred)
    if pred == "last()":
        return pos == size
    m = _CONTAINS_RE.match(pred)
    if m:
        needle = m.group(2)[1:-1]
        return any(needle in v for v in _operand_values(node, m.group(1)))
    m = _CMP_RE.match(pred)
    if m:
        lit = m.group(2)[1:-1]
        return any(v == lit for v in _operand_values(node, m.group(1).strip()))
    # existence test: @attr or relative path
    return bool(_operand_values(node, pred))


def _evaluate(steps: list[tuple[bool, str]], context: list) -> list:
    nodes = context
    for desc, step in steps:
        test, preds = _parse_step(step)
        grouped = _node_test(nodes, test, desc)
        nxt = []
        for group in grouped:
            sel = group
            for pred in preds:
                size = len(sel)
                sel = [n for i, n in enumerate(sel, 1) if _eval_predicate(pred, n, i, size)]
            nxt.extend(sel)
        # document-order dedup
        seen_ids = set()
        ordered = []
        for n in sorted(nxt, key=lambda x: x.ord):
            if id(n) not in seen_ids:
                seen_ids.add(id(n))
                ordered.append(n)
        nodes = ordered
        if not nodes:
            return []
    return nodes


def xpath_all(root: Node, path: str) -> list:
    """All matching nodes in document order."""
    return _evaluate(_split_steps(path), [root])


def html_xpath_first(content: str, path: str) -> str | None:
    """Parse ``content`` as HTML, return the string-value of the first node
    matched by ``path`` (document order), or None when nothing matches /
    the content cannot be parsed. Mirrors xPathNodeRule.GetFirst
    (/root/reference/ruler/xpath_node.go:33-60)."""
    root = parse_html(content)
    if root is None:
        return None
    try:
        nodes = xpath_all(root, path)
    except XPathError:
        return None
    if not nodes:
        return None
    return nodes[0].string_value()


_WS_RE = re.compile(r"\s+")


def html_visible_text(content: str) -> str:
    """Whitespace-normalized visible text (script/style excluded).

    This is OUR text-extraction contract for the corpus `text` column — the
    per-row byte-identical invariant (BASELINE.json input_hint) is defined
    against this function.
    """
    root = parse_html(content)
    if root is None:
        return ""
    parts: list[str] = []
    stack = [root]
    while stack:
        n = stack.pop()
        if n.kind == TEXT:
            parts.append(n.data)
        elif n.kind in (ELEMENT, DOCUMENT):
            if n.kind == ELEMENT and n.tag in ("script", "style"):
                continue
            stack.extend(reversed(n.children))
    return _WS_RE.sub(" ", "".join(parts)).strip()
