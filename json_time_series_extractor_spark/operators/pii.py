"""PII detection and redaction for web-text corpora.

Training-data pipelines scrub personally-identifying strings before
anything downstream sees them (C4 and most public crawls do a variant
of this). This module provides the standard regex families as a pure
JVM ``regexp_replace``/``regexp_count`` chain — zero Python in the hot
path, map-only, embarrassingly parallel at any scale.

Pattern design constraints:

- RE2-compatible (no lookaround, no backreferences) so the SAME
  pattern strings run under Java regex (Spark) and RE2 (DuckDB
  oracles) with identical match sets: character classes, bounded
  quantifiers, non-capturing groups, and ``\\b`` only.
- Redaction order is significant and fixed (emails before the numeric
  families; IPv4 before phone so dotted quads are never half-eaten by
  the dotted phone form); counts are taken on the ORIGINAL text so
  they are independent of the order.

These are deliberately the high-precision/''obvious'' forms (emails,
dotted quads, NNN-NN-NNNN, NNN-NNN-NNNN, 4x4 card groups) — the
recall-oriented fuzzier families (international phones, free-form
numbers) trade precision for recall and belong in a caller-tuned
pattern table, which ``redact`` accepts.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

#: (name, pattern, replacement) in REDACTION ORDER.
PII_PATTERNS: Tuple[Tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("cc", r"\b(?:\d{4}[- ]){3}\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
)


def with_pii_counts(docs: DataFrame, *, text_col: str = "text",
                    patterns: Sequence[Tuple[str, str, str]]
                    = PII_PATTERNS) -> DataFrame:
    """Add ``n_<name>`` match counts per pattern (on the original
    text, order-independent) and ``has_pii``."""
    out = docs
    any_col: Column = F.lit(False)
    for name, pat, _ in patterns:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"n_{name}", c.cast("long"))
        any_col = any_col | (F.col(f"n_{name}") > 0)
    return out.withColumn("has_pii", any_col)


def redact_pii(docs: DataFrame, *, text_col: str = "text",
               out_col: str = "redacted",
               patterns: Sequence[Tuple[str, str, str]]
               = PII_PATTERNS) -> DataFrame:
    """Add ``out_col``: the text with every pattern family replaced by
    its placeholder, applied in table order (a chained
    ``regexp_replace`` — one codegen'd projection, no Python)."""
    col = F.col(text_col)
    for _, pat, repl in patterns:
        col = F.regexp_replace(col, pat, repl)
    return docs.withColumn(out_col, col)


def pii_count_exprs_sql(text_expr: str,
                        patterns: Sequence[Tuple[str, str, str]]
                        = PII_PATTERNS) -> str:
    """DuckDB mirror of :func:`with_pii_counts`'s projections —
    generated from the same pattern table so the two engines can never
    drift apart."""
    cols = [
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in patterns]
    anyc = " OR ".join(f"n_{name} > 0" for name, _, _ in patterns)
    return ",\n       ".join(cols) + f",\n       ({anyc}) AS has_pii"


def pii_redact_expr_sql(text_expr: str,
                        patterns: Sequence[Tuple[str, str, str]]
                        = PII_PATTERNS) -> str:
    """DuckDB mirror of :func:`redact_pii`: nested global
    regexp_replace in the same order."""
    expr = text_expr
    for _, pat, repl in patterns:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
