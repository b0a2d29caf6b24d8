"""openCypher TCK expected-value grammar → canonical comparable forms.

The TCK (`tests/tck/features` in the reference checkout — the public
Apache-2.0 openCypher conformance corpus, which the reference runs via
behave, ``tests/tck/test_tck.py:13-23``) writes expected results as
Cypher-ish literals: ``42``, ``'str'``, ``[1, 2]``, ``{k: 1}``,
``(:L {p: 1})``, ``[:T {p: 1}]``, ``<(:A)-[:T]->(:B)>``. This module
parses those into canonical tuples and converts Spark result values
(our node/edge/path structs) into the same canonical space so rows
compare directly.
"""

from __future__ import annotations

import math


class TCKParseError(ValueError):
    pass


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def peek(self):
        # NUL at end-of-input: "" would make every `peek() in "..."`
        # membership test true (empty string is a substring of anything)
        return self.s[self.i] if self.i < len(self.s) else "\x00"

    def eat(self, ch: str):
        if not self.s.startswith(ch, self.i):
            raise TCKParseError(
                f"expected {ch!r} at {self.i} in {self.s!r}")
        self.i += len(ch)

    def opt(self, ch: str) -> bool:
        if self.s.startswith(ch, self.i):
            self.i += len(ch)
            return True
        return False


def _parse_name(p: _P) -> str:
    j = p.i
    while p.i < len(p.s) and (p.s[p.i].isalnum() or p.s[p.i] in "_$"):
        p.i += 1
    if p.i == j:
        raise TCKParseError(f"expected name at {j} in {p.s!r}")
    return p.s[j:p.i]


def _parse_string(p: _P) -> str:
    p.eat("'")
    out = []
    while True:
        c = p.peek()
        if c == "":
            raise TCKParseError("unterminated string")
        if c == "\\":
            # Cypher string-literal escapes (the TCK expected tables
            # use Cypher literal syntax): \n \t \r \b \f are control
            # characters, \\ \' \" pass the char through
            p.i += 1
            esc = p.peek()
            out.append({"n": "\n", "t": "\t", "r": "\r",
                        "b": "\b", "f": "\f"}.get(esc, esc))
            p.i += 1
            continue
        if c == "'":
            p.i += 1
            return "".join(out)
        out.append(c)
        p.i += 1


def _parse_number(p: _P):
    j = p.i
    if p.peek() in "+-":
        p.i += 1
    while p.peek().isdigit():
        p.i += 1
    is_float = False
    if p.peek() == ".":
        nxt = p.s[p.i + 1] if p.i + 1 < len(p.s) else ""
        if nxt.isdigit():
            is_float = True
            p.i += 1
            while p.peek().isdigit():
                p.i += 1
    if p.peek() in "eE":
        is_float = True
        p.i += 1
        if p.peek() in "+-":
            p.i += 1
        while p.peek().isdigit():
            p.i += 1
    tok = p.s[j:p.i]
    if tok in ("", "+", "-"):
        raise TCKParseError(f"bad number at {j} in {p.s!r}")
    return float(tok) if is_float else int(tok)


def _parse_props(p: _P) -> dict:
    """``{k: v, ...}``"""
    p.eat("{")
    out = {}
    p.ws()
    if p.opt("}"):
        return out
    while True:
        p.ws()
        k = _parse_name(p)
        p.ws()
        p.eat(":")
        p.ws()
        out[k] = parse_value_inner(p)
        p.ws()
        if p.opt("}"):
            return out
        p.eat(",")


def _parse_node(p: _P):
    """``(:L1:L2 {props})`` — also bare ``()``."""
    p.eat("(")
    labels = []
    props = {}
    p.ws()
    # optional variable name (paths sometimes write (a))
    if p.peek() not in ":){ ":
        _parse_name(p)
        p.ws()
    while p.opt(":"):
        labels.append(_parse_name(p))
        p.ws()
    p.ws()
    if p.peek() == "{":
        props = _parse_props(p)
    p.ws()
    p.eat(")")
    return ("node", frozenset(labels), _freeze_props(props))


def _parse_rel(p: _P):
    """``[:T {props}]``"""
    p.eat("[")
    p.ws()
    rtype = None
    props = {}
    if p.peek() not in ":]{":
        _parse_name(p)
        p.ws()
    if p.opt(":"):
        rtype = _parse_name(p)
        p.ws()
    else:
        # a TCK relationship cell always carries ``:TYPE`` — without it
        # this is a list (e.g. ``[0]``), not a relationship
        raise TCKParseError("not a relationship")
    if p.peek() == "{":
        props = _parse_props(p)
        p.ws()
    p.eat("]")
    return ("rel", rtype, _freeze_props(props))


def _parse_path(p: _P):
    """``<(:A)-[:T]->(:B)...>`` → ("path", (node, (rel, dir), node, …))"""
    p.eat("<")
    p.ws()
    elems = [_parse_node(p)]
    while True:
        p.ws()
        if p.opt(">"):
            return ("path", tuple(elems))
        if p.opt("<-"):
            rel = _parse_rel(p)
            p.eat("-")
            direction = "in"
        else:
            p.eat("-")
            rel = _parse_rel(p)
            if p.opt("->"):
                direction = "out"
            else:
                p.eat("-")
                direction = "both"
        elems.append((rel, direction))
        elems.append(_parse_node(p))


def parse_value_inner(p: _P):
    p.ws()
    c = p.peek()
    if c == "'":
        return _parse_string(p)
    if c == "[":
        # list or relationship: relationship starts with [: or [name:
        j = p.i
        try:
            return _parse_rel(p)
        except TCKParseError:
            p.i = j
        p.eat("[")
        p.ws()
        if p.opt("]"):
            return ()
        items = []
        while True:
            items.append(parse_value_inner(p))
            p.ws()
            if p.opt("]"):
                return tuple(items)
            p.eat(",")
    if c == "{":
        return _freeze_props(_parse_props(p))
    if c == "(":
        return _parse_node(p)
    if c == "<":
        return _parse_path(p)
    if p.s.startswith("true", p.i):
        p.i += 4
        return True
    if p.s.startswith("false", p.i):
        p.i += 5
        return False
    if p.s.startswith("null", p.i):
        p.i += 4
        return None
    if p.s.startswith("NaN", p.i):
        p.i += 3
        return "NaN"
    if p.s.startswith("Inf", p.i):
        p.i += 3
        return math.inf
    if p.s.startswith("-Inf", p.i):
        p.i += 4
        return -math.inf
    return _parse_number(p)


def _freeze_props(d: dict):
    return tuple(sorted((k, _canon(v)) for k, v in d.items()))


def _canon(v):
    """Canonicalize a parsed value (floats → 9 sig digits, like the
    contract checker)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return float(f"{v:.9g}")
    return v


def parse_cell(s: str):
    """Parse one expected-result table cell."""
    p = _P(s.strip())
    v = parse_value_inner(p)
    p.ws()
    if p.i != len(p.s):
        raise TCKParseError(f"trailing input in cell {s!r}")
    return _canon_deep(v)


def _canon_deep(v):
    if isinstance(v, tuple) and v and v[0] in ("node", "rel", "path"):
        return v
    if isinstance(v, tuple):
        return tuple(_canon_deep(x) for x in v)
    return _canon(v)


# ------------------------------------------------------- Spark → canonical
_NODE_INTERNAL = {"_id", "_label", "_labels"}
_REL_INTERNAL = {"_id", "_src", "_dst", "_rel"}


def _is_node_row(d: dict) -> bool:
    # union-schema entity lists carry null _src/_dst on node elements
    return "_id" in d and ("_label" in d or "_labels" in d) \
        and d.get("_src") is None


def _is_rel_row(d: dict) -> bool:
    return "_id" in d and d.get("_src") is not None \
        and d.get("_dst") is not None


def _row_props(d: dict, internal: set) -> tuple:
    return tuple(sorted(
        (k, spark_to_canon(v)) for k, v in d.items()
        if k not in internal and v is not None))


def node_canon(d: dict):
    labels = []
    if d.get("_labels") is not None:
        labels = [lb for lb in d["_labels"] if lb]
    elif d.get("_label"):
        labels = [d["_label"]]
    return ("node", frozenset(labels), _row_props(d, _NODE_INTERNAL))


def rel_canon(d: dict):
    return ("rel", d.get("_rel"), _row_props(d, _REL_INTERNAL))


def path_canon(d: dict):
    """Our path struct {nodes: [...], edges: [...]} → TCK path shape.
    Direction of edge k is recovered from _src/_dst vs the flanking
    node ids."""
    nodes = [r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
             for r in (d.get("nodes") or [])]
    edges = [r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
             for r in (d.get("edges") or [])]
    elems = []
    if nodes:
        elems.append(node_canon(nodes[0]))
    for k, e in enumerate(edges):
        left = nodes[k]["_id"] if k < len(nodes) else None
        direction = "out" if e.get("_src") == left else "in"
        elems.append((rel_canon(e), direction))
        if k + 1 < len(nodes):
            elems.append(node_canon(nodes[k + 1]))
    return ("path", tuple(elems))


_VARIANT_FIELDS = ("_vt", "_i", "_d", "_s", "_b")


def _variant_decode(d: dict):
    """Per-value variant struct (planner/variant.py) → plain value."""
    tag = d.get("_vt")
    if tag == 1:
        return d.get("_i")
    if tag == 2:
        return _canon(d.get("_d"))
    if tag == 3:
        return d.get("_s")
    if tag == 4:
        return d.get("_b")
    if tag == 5:
        return tuple(spark_to_canon(x) for x in (d.get("_a") or []))
    return None


def spark_to_canon(v):
    """A collected Spark value → canonical comparable form."""
    if hasattr(v, "asDict"):  # Row
        d = v.asDict(recursive=False)
        if tuple(d)[:5] == _VARIANT_FIELDS and \
                set(d) <= set(_VARIANT_FIELDS) | {"_a"}:
            return _variant_decode(d)
        if tuple(d) == ("_tt", "_days", "_nanos", "_months", "_offset",
                        "_zone"):
            # temporal struct → its ISO string (the TCK's expected form)
            from ..functions.temporal_kernel import from_row
            return str(from_row(d["_tt"], d["_days"], d["_nanos"],
                                d["_months"], d["_offset"], d["_zone"]))
        if set(d) == {"nodes", "edges"}:
            return path_canon(d)
        if _is_rel_row(d):
            return rel_canon(d)
        if _is_node_row(d):
            return node_canon(d)
        if "__maplit" in d:
            # literal map (planner marker): null values are KEPT
            return _freeze_props({k: spark_to_canon(x)
                                  for k, x in d.items() if k != "__maplit"})
        return _freeze_props({k: spark_to_canon(x) for k, x in d.items()
                              if x is not None})
    if isinstance(v, dict):
        return _freeze_props({k: spark_to_canon(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return tuple(spark_to_canon(x) for x in v)
    if isinstance(v, float):
        return _canon(v)
    from decimal import Decimal
    if isinstance(v, Decimal):
        return _canon(float(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def sort_lists_deep(v):
    """For 'ignoring element order for lists' comparisons."""
    if isinstance(v, tuple) and v and v[0] in ("node", "rel", "path"):
        return v
    if isinstance(v, tuple):
        return tuple(sorted((sort_lists_deep(x) for x in v), key=repr))
    return v
