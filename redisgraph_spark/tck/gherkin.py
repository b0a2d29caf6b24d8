"""Minimal Gherkin parser for the openCypher TCK feature subset.

Supports exactly the constructs the TCK corpus uses: Feature /
Scenario / Scenario Outline + Examples, steps with docstrings
(\"\"\") and data tables (| a | b |), tags, comments. Not a general
Gherkin implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Step:
    text: str                      # step text without the keyword
    doc: str | None = None         # docstring payload
    table: list[list[str]] | None = None


@dataclass
class Scenario:
    feature: str
    name: str
    tags: list[str]
    steps: list[Step] = field(default_factory=list)


def _split_table_row(line: str) -> list[str]:
    # | a | b | — split on unescaped pipes, strip cells
    body = line.strip()
    assert body.startswith("|")
    cells, cur, esc = [], [], False
    for c in body[1:]:
        if esc:
            # table-level escapes are ONLY \| and \\ (the TCK style
            # note in Literals6.feature:86); any other \x passes
            # through for the Cypher-value parser
            if c in ("|", "\\"):
                cur.append(c)
            else:
                cur.append("\\")
                cur.append(c)
            esc = False
        elif c == "\\":
            esc = True
        elif c == "|":
            cells.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    return cells


_STEP_KW = ("Given ", "When ", "Then ", "And ", "But ")


def parse_feature(text: str, feature_name: str = "") -> list[Scenario]:
    lines = text.split("\n")
    i = 0
    n = len(lines)
    feature = feature_name
    scenarios: list[Scenario] = []
    pending_tags: list[str] = []

    cur: Scenario | None = None
    outline: Scenario | None = None
    background: Scenario | None = None   # steps prepended to every scenario
    examples_mode = False
    examples_rows: list[list[str]] = []

    def flush_outline():
        nonlocal outline, examples_rows, examples_mode
        if outline is not None and examples_rows:
            header = examples_rows[0]
            for ri, row in enumerate(examples_rows[1:], 1):
                subs = dict(zip(header, row))
                sc = Scenario(outline.feature,
                              f"{outline.name} #{ri}", list(outline.tags))
                for st in outline.steps:
                    sc.steps.append(Step(
                        _subst(st.text, subs),
                        _subst(st.doc, subs) if st.doc is not None else None,
                        [[_subst(c, subs) for c in r] for r in st.table]
                        if st.table is not None else None))
                scenarios.append(sc)
        outline = None
        examples_rows = []
        examples_mode = False

    while i < n:
        raw = lines[i]
        line = raw.strip()
        i += 1
        if not line or line.startswith("#"):
            continue
        if line.startswith("@"):
            pending_tags = line.split()
            continue
        if line.startswith("Feature:"):
            feature = line[len("Feature:"):].strip()
            background = None
            continue
        if line.startswith("Background:"):
            # steps collected here are replayed at the start of every
            # scenario in the feature (the TCK uses it for shared
            # graph fixtures)
            background = Scenario(feature, "__background__", [])
            cur = background
            continue
        if line.startswith("Scenario Outline:") or \
                line.startswith("Scenario Template:"):
            flush_outline()
            cur = None
            outline = Scenario(feature,
                               line.split(":", 1)[1].strip(), pending_tags)
            if background is not None:
                outline.steps.extend(background.steps)
            pending_tags = []
            continue
        if line.startswith("Scenario:"):
            flush_outline()
            cur = Scenario(feature, line.split(":", 1)[1].strip(),
                           pending_tags)
            if background is not None:
                cur.steps.extend(background.steps)
            pending_tags = []
            scenarios.append(cur)
            continue
        if line.startswith("Examples:"):
            examples_mode = True
            continue
        target = outline if outline is not None else cur
        if line.startswith('"""'):
            # docstring for the last step
            doc_lines = []
            # preserve indentation relative to the opening quotes
            indent = len(raw) - len(raw.lstrip())
            while i < n and lines[i].strip() != '"""':
                doc_lines.append(lines[i][indent:]
                                 if lines[i][:indent].strip() == ""
                                 else lines[i])
                i += 1
            i += 1  # closing quotes
            if target is not None and target.steps:
                target.steps[-1].doc = "\n".join(doc_lines)
            continue
        if line.startswith("|"):
            row = _split_table_row(line)
            if examples_mode:
                examples_rows.append(row)
            elif target is not None and target.steps:
                if target.steps[-1].table is None:
                    target.steps[-1].table = []
                target.steps[-1].table.append(row)
            continue
        for kw in _STEP_KW:
            if line.startswith(kw):
                if target is not None:
                    target.steps.append(Step(line[len(kw):].strip()))
                break
    flush_outline()
    return scenarios


def _subst(s: str, subs: dict[str, str]) -> str:
    for k, v in subs.items():
        s = s.replace(f"<{k}>", v)
    return s
