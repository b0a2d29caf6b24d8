"""Regex tokenizer for the Cypher subset.

Replaces libcypher-parser's lexer (reference dep ``deps/libcypher-parser``)
with a small regex scanner. Keywords are case-insensitive; identifiers may
be backtick-quoted; strings use single or double quotes with backslash
escapes; parameters are ``$name``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "match", "optional", "where", "return", "with", "unwind", "as",
    "order", "by", "skip", "limit", "asc", "ascending", "desc",
    "descending", "distinct", "create", "merge", "set", "remove", "delete",
    "detach", "union", "all", "call", "yield", "and", "or", "xor",
    "not", "in", "is", "null", "true", "false", "starts", "ends",
    "contains", "case", "when", "then", "else", "end", "on", "count",
    "exists", "any", "none", "single", "reduce",
}

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<hexint>0[xX][0-9a-fA-F]+)
  | (?P<float>(?:\d+\.\d+|\.\d+)(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<octint>0[oO][0-7]+|0[0-7]+(?![0-9a-zA-Z_.]))
  | (?P<int>\d+)
  | (?P<string>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<param>\$[A-Za-z0-9_]+)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*|`[^`]*`)
  | (?P<op><=|>=|<>|!=|=~|\.\.|->|<-|[-+*/%^=<>()\[\]{},.:|])
""", re.VERBOSE)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'",
            '"': '"', "b": "\b", "f": "\f"}


@dataclass
class Token:
    kind: str   # 'kw' | 'name' | 'int' | 'float' | 'string' | 'param' | 'op' | 'eof'
    value: object
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}:{self.value!r}"


def _unescape(raw: str) -> str:
    body = raw[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u":
                # \uXXXX requires exactly four hex digits
                # (InvalidUnicodeLiteral, openCypher Literals6[13])
                hexs = body[i + 2:i + 6]
                if len(hexs) < 4 or any(
                        h not in "0123456789abcdefABCDEF" for h in hexs):
                    raise SyntaxError(
                        f"Invalid unicode literal '\\u{hexs}': expected "
                        "four hexadecimal digits")
                out.append(chr(int(hexs, 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SyntaxError(
                f"Unexpected character {text[pos]!r} at position {pos}")
        pos = m.end()
        kind = m.lastgroup
        raw = m.group()
        if kind == "ws":
            continue
        if kind == "int":
            tokens.append(Token("int", int(raw), m.start()))
        elif kind == "hexint":
            tokens.append(Token("int", int(raw, 16), m.start()))
        elif kind == "octint":
            body = raw[2:] if raw[1:2] in ("o", "O") else raw[1:]
            tokens.append(Token("int", int(body, 8), m.start()))
        elif kind == "float":
            fv = float(raw)
            if fv in (float("inf"), float("-inf")):
                # a literal too large for an IEEE double is a compile-
                # time error (FloatingPointOverflow, Literals5[27])
                raise SyntaxError(
                    f"Floating point number '{raw[:32]}…' is out of "
                    "range for a 64-bit double")
            tokens.append(Token("float", fv, m.start()))
        elif kind == "string":
            tokens.append(Token("string", _unescape(raw), m.start()))
        elif kind == "param":
            tokens.append(Token("param", raw[1:], m.start()))
        elif kind == "name":
            if raw.startswith("`"):
                tokens.append(Token("name", raw[1:-1], m.start()))
            elif raw.lower() in KEYWORDS:
                # keep original case: keywords double as identifiers
                # (labels/properties named `Order`, `count`, …)
                tokens.append(Token("kw", raw, m.start()))
            else:
                tokens.append(Token("name", raw, m.start()))
        else:
            tokens.append(Token("op", raw, m.start()))
    tokens.append(Token("eof", None, n))
    return tokens
