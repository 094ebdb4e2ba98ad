"""PII detection/redaction for training-data pipelines (north-star
surface): emails, IPv4 addresses, and international-format phone numbers
found in free text are counted and replaced with stable placeholder tokens.

Pure column expressions (``regexp_extract_all`` / ``regexp_replace``) —
zero Python, rides the scan, trivially parallel at 100 TB. The patterns are
deliberately restricted to syntax with identical semantics in Java regex
(Spark) and RE2 (DuckDB): character classes, bounded repetition, and ASCII
word boundaries only — no lookaround, no backreferences — so the DuckDB
oracle mirrors the redaction byte-for-byte and the value hash checks it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: kind -> (pattern, replacement token). Order matters: emails first (their
#: local part may contain digits a later pattern could half-match), then
#: phones, then bare IPs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """One count column per PII kind (matches BEFORE redaction)."""
    return {
        kind: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")
        for kind, pat, _tok in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its placeholder, in pattern order."""
    out = col
    for _kind, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


def sql_pii_counts(expr: str) -> dict[str, str]:
    """DuckDB mirrors of :func:`pii_counts` over a text expression."""
    return {
        kind: f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"
        for kind, pat, _tok in PII_PATTERNS
    }


def sql_redact_pii(expr: str) -> str:
    """DuckDB mirror of :func:`redact_pii` (global flag — Spark's
    regexp_replace is replace-all by default, DuckDB's is first-match)."""
    out = expr
    for _kind, pat, tok in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out
