"""PII detection and redaction over text columns.

Training corpora scraped from the web carry emails, phone numbers and IP
addresses that must be found and scrubbed before the data ships (the
standard pre-training curation step alongside dedup and quality
filtering — e.g. the C4/RefinedWeb pipelines). The reference engine has
no PII pass; this is a Spark-side extension in the same spirit as its
document-processing surface (processBatch text transforms,
lib.ts:694-710): a pure per-row map.

Everything here is JVM-side ``regexp_count`` / ``regexp_replace`` on
built-in Columns — map-only, no shuffle, whole-stage-codegen'd, so the
scrub runs at full scan speed on any corpus size. No UDFs.

Patterns are deliberately RE2-compatible (no lookaround, no
backreferences) so the same strings work in Spark (java.util.regex),
DuckDB (RE2), and Hyperscan-style scanners if the scrub ever moves
off-Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies most-specific first (an email contains
# digit runs a looser pattern might claim; IPv4 before phone so dotted
# quads never half-match a phone rule).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?1?[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ipv4": "[IP]",
    "phone": "[PHONE]",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (each pattern scans the
    raw column independently, so one kind's redaction can never hide
    another kind's count)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{kind}": F.regexp_count(c, F.lit(pat))
        for kind, pat in PII_PATTERNS.items()
    }


def redact(text: Column | str) -> Column:
    """Replace every PII match with its bracketed token, most-specific
    pattern first."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, REDACTION_TOKENS[kind])
    return c


def scan_pii(
    df: DataFrame, text_col: str = "text", keep_redacted: bool = True
) -> DataFrame:
    """Append per-kind counts, an ``any_pii`` flag, the redacted text and
    the redaction char delta (original length − redacted length; > 0 when
    the bracketed tokens are shorter than what they replaced).

    Scale: narrow map over the scan — every added column is a codegen'd
    JVM expression, so this composes with downstream filters/aggregates
    without a materialization barrier. At 100 TB the scrub is exactly one
    pass over the text bytes.
    """
    out = df.withColumns(pii_counts(F.col(text_col)))
    any_pii = None
    for kind in PII_PATTERNS:
        flag = F.col(f"n_{kind}") > 0
        any_pii = flag if any_pii is None else (any_pii | flag)
    out = out.withColumn("any_pii", any_pii)
    if keep_redacted:
        out = out.withColumn("redacted", redact(F.col(text_col))).withColumn(
            "chars_redacted",
            F.length(F.col(text_col)) - F.length(F.col("redacted")),
        )
    return out
