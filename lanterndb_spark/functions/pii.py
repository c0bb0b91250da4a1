"""PII detection & redaction — regex scrubbing for training corpora.

Pretraining pipelines scrub obvious personally-identifiable strings
(emails, phone numbers, IPs, card/SSN-shaped numbers) before the corpus
ships. This module is deliberately regex-only: patterns restricted to
the syntax subset Java regex (Spark) and RE2 (DuckDB) interpret
identically — no lookaround, no backrefs, ASCII classes — so every
count and every redacted byte is reproducible by the SQL oracle.

Everything is a pure Catalyst projection (regexp_count /
regexp_replace, JVM-side, whole-stage codegen): at 100 TB the scrub
rides the scan it's part of — zero shuffles, zero Python.

Semantics:

- counts are over the RAW text per kind; a string matching two kinds
  (a card number is also phone-shaped) counts in both — counts answer
  "what did this pattern see", not "how many redactions happened".
- redaction applies kinds in REDACTION_ORDER sequentially; placeholders
  are digit-free, so earlier redactions can't re-match later patterns
  (an email's digits never get phone-matched). Deterministic on both
  engines because the order is fixed.

The reference has no PII surface; this belongs to the training-data
extension set (README "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# (kind, pattern, placeholder) — pattern syntax must stay in the
# Java-regex ∩ RE2 subset (see module docstring)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b", "<CARD>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().\s-]{7,14}\d", "<PHONE>"),
]

REDACTION_ORDER = [p[0] for p in PII_PATTERNS]

_BY_KIND = {k: (pat, repl) for k, pat, repl in PII_PATTERNS}


def pii_count(col, kind: str) -> Column:
    """Match count of one PII kind over the raw text."""
    pat, _ = _BY_KIND[kind]
    return F.regexp_count(_c(col), F.lit(pat)).cast("int")


def pii_counts(col) -> list[Column]:
    """One aliased int column per kind: ``n_email, n_ssn, ...``."""
    return [pii_count(col, k).alias(f"n_{k}") for k in REDACTION_ORDER]


def pii_redact(col, kinds: list[str] | None = None) -> Column:
    """Text with each kind's matches replaced by its placeholder, kinds
    applied in REDACTION_ORDER."""
    out = _c(col)
    for k in kinds if kinds is not None else REDACTION_ORDER:
        pat, repl = _BY_KIND[k]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_flag(col) -> Column:
    """True when any kind matches."""
    flag = F.lit(False)
    for k in REDACTION_ORDER:
        flag = flag | (pii_count(col, k) > 0)
    return flag


def scrub(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Append per-kind counts, ``has_pii`` and the redacted text (in
    ``out_col``, default ``{text_col}_clean``) — one projection."""
    out_col = out_col or f"{text_col}_clean"
    return df.select(
        "*",
        *pii_counts(text_col),
        pii_flag(text_col).alias("has_pii"),
        pii_redact(text_col).alias(out_col),
    )


def duck_pii_fragments(col: str) -> dict[str, str]:
    """DuckDB SQL twins: ``{'n_email': ..., 'redacted': ...}`` — same
    patterns, same order (oracle.py-style fragment builder)."""
    # DuckDB keeps backslashes literal inside '...' literals, so patterns
    # pass through verbatim; only quotes need doubling
    frags: dict[str, str] = {}
    for k, pat, _ in PII_PATTERNS:
        esc = pat.replace("'", "''")
        frags[f"n_{k}"] = f"CAST(len(regexp_extract_all({col}, '{esc}')) AS INT)"
    red = col
    for k in REDACTION_ORDER:
        pat, repl = _BY_KIND[k]
        esc = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{esc}', '{repl}', 'g')"
    frags["redacted"] = red
    return frags
