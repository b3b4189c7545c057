"""PII scrubbing for training-data pipelines.

Beyond-reference surface (task north star): the standard pre-training
cleaning pass that replaces emails / URLs / phone numbers with
placeholder tokens and reports per-document redaction counts (the usual
audit output for a scrubbing job).

Spark-first shape: three chained ``regexp_replace`` + three
``regexp_extract_all`` counts — all native expressions inside one
projection (whole-stage codegen, zero shuffles, embarrassingly parallel
at any scale). The patterns are deliberately restricted to the regex
subset Java (Spark) and RE2 (DuckDB) evaluate identically — character
classes, bounded/unbounded repetition, alternation; NO lookaround or
backreferences — so the operator keeps an exact SQL oracle.

Pattern scope (documented, not hidden): pattern-based PII detection is
inherently heuristic — these catch the common literal shapes (RFC-ish
emails, http(s) URLs, international/US-style phone runs), not every
obfuscated variant ("bob at example dot com"). The audit counts exist
so a pipeline can MEASURE what was caught.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: applied in this order — URLs first (a URL may embed an '@' userinfo
#: section that the email pattern would otherwise split), then emails,
#: then phone runs. The oracle replays the same order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # leading digit or +, then >=6 of [digit ( ) - space .], ending in a
    # digit: catches +1 (650) 555-0100 / 650-555-0100 / 650 555 0100
    ("phone", r"\+?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrubbed text + per-kind redaction counts, one row per document:
    (id, <other input columns>, scrubbed, n_url, n_email, n_phone).
    Counts are taken on the text state each pattern actually sees (post
    the previous replacements), so ``n_*`` equals the number of
    placeholders that pattern inserted. Non-text input columns pass
    through untouched (still one codegen projection), so the operator
    slots mid-pipeline without a re-join."""
    cur = F.col(text_col)
    counts = []
    for name, pat, _tok in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, _tok)
    # exclude our own output names: re-scrubbing a frame that already
    # carries scrubbed/n_* must replace them, not emit duplicate columns
    out_names = {"scrubbed", "n_url", "n_email", "n_phone"}
    passthrough = [
        c for c in df.columns if c not in (id_col, text_col) and c not in out_names
    ]
    return df.select(
        F.col(id_col), *passthrough, cur.alias("scrubbed"), *counts
    )
