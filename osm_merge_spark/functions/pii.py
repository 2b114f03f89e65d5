"""PII detection and redaction column functions for the training-data
pipeline layer.

Pretraining corpora are scrubbed of emails / phone numbers / IP addresses /
national-ID-shaped strings before tokenization (standard practice across the
public pipeline literature — C4, RefinedWeb, Dolma all document a regex
scrub stage).  Everything here is a JVM-side ``regexp_count`` /
``regexp_replace`` Column expression — no Python in the hot path, so the
scrub runs inside whole-stage codegen at 100 TB and has an exact DuckDB
twin (RE2 and Java regex agree on this deliberately backreference-free,
POSIX-class-free pattern subset).

Pattern order is FIXED (the dict below is ordered); redaction applies the
patterns in that order on both engines, so overlapping matches resolve
identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered, engine-portable patterns (valid + identical semantics in Java
# regex and RE2): no backreferences, no lookaround, no POSIX classes.
# email runs first so its local part can't be half-eaten by id patterns.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "id_number": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_count(text: Column | str, kind: str) -> Column:
    """Match count for one PII pattern (bigint)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(PII_PATTERNS[kind])).cast("bigint")


def pii_counts(text: Column | str) -> dict[str, Column]:
    """All pattern counts, name → bigint Column (fixed dict order)."""
    return {k: pii_count(text, k) for k in PII_PATTERNS}


def pii_redact(text: Column | str) -> Column:
    """Replace every PII match with ``<KIND>``, patterns applied in the
    fixed ``PII_PATTERNS`` order (email before the numeric patterns, so a
    numeric local part is redacted as part of its email, never twice)."""
    t = F.col(text) if isinstance(text, str) else text
    out = t
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_sql_counts(text_sql: str) -> dict[str, str]:
    """DuckDB twins of ``pii_counts`` (len(regexp_extract_all))."""
    return {
        k: f"CAST(len(regexp_extract_all({text_sql}, '{_sql_pat(p)}')) AS BIGINT)"
        for k, p in PII_PATTERNS.items()
    }


def pii_sql_redact(text_sql: str) -> str:
    """DuckDB twin of ``pii_redact`` (regexp_replace with the 'g' flag —
    DuckDB replaces only the first match by default, Spark replaces all)."""
    out = text_sql
    for kind, pat in PII_PATTERNS.items():
        out = f"regexp_replace({out}, '{_sql_pat(pat)}', '<{kind.upper()}>', 'g')"
    return out


def _sql_pat(pat: str) -> str:
    return pat.replace("'", "''")
