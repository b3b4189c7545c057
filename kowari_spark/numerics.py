"""Cross-engine numeric helpers shared by driver-side and Arrow-batch
code that must agree bit-for-bit with Spark SQL expressions."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, digits: int) -> float:
    """Decimal-correct HALF_UP rounding of a double — the exact
    semantics of Spark's ROUND(col, n) (BigDecimal.setScale(n, HALF_UP)
    on the binary expansion), so values rounded in Python agree
    bit-for-bit with an engine that rounds the same double SQL-side."""
    return float(
        Decimal(x).quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP)
    )


def py_hash64(s: str) -> int:
    """Python mirror of ``functions.text.base_hash64`` (first 15 hex
    chars of md5 as int64) — the ONE place the portable hash contract
    exists Python-side, so Arrow engines can't drift from the SQL/
    expression implementations."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
