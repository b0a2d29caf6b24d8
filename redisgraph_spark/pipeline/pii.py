"""PII detection and redaction over document text.

Pre-training corpora are scrubbed of obvious personally-identifying
strings before the tokenizer ever sees them. The detectors here are
the standard first-pass regex family — emails, NANP-style phone
numbers, IPv4 addresses — expressed as JVM-side `regexp_count` /
`regexp_replace` columns so the scan stays inside whole-stage codegen
(no Python in the hot path) and the same RE2-safe patterns run
verbatim in the DuckDB oracle.

Pattern dialect notes: every pattern below avoids back-references,
look-around, and possessive quantifiers, so it means the same thing to
Java `java.util.regex` (Spark) and RE2 (DuckDB). `\\b` and
non-capturing groups are supported by both.

Scale shape: pure per-row map over the text column — no shuffle, no
state; at 100 TB this pipelines with the scan and parallelizes
perfectly. Redaction order is fixed (email, then phone, then IPv4) so
output is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: applied top-to-bottom during redaction. IPv4 must come
# after phone so digit runs consumed by the phone pattern are gone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def pii_counts(text: Column) -> list[Column]:
    """One `n_<kind>` count column per detector.
    SQL: len(regexp_extract_all(text, pattern))."""
    return [F.regexp_count(text, F.lit(pat)).cast("long")
            .alias(f"n_{kind}") for kind, pat, _ in PII_PATTERNS]


def redact(text: Column) -> Column:
    """Replace every detector hit with its placeholder token, in the
    fixed PII_PATTERNS order. SQL: nested regexp_replace(..., 'g')."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, redacted) per document.

    A 100 TB corpus runs this as a single narrow map stage fused into
    the parquet scan; downstream filters on the count columns (e.g.
    `n_email = 0`) push back into the same stage.
    """
    t = F.col(text_col)
    return docs.select(F.col(id_col), *pii_counts(t),
                       redact(t).alias("redacted"))
