"""Int8 scalar quantization for embedding columns.

Beyond-reference capability (the reference stores f32 only —
SURVEY.md §1.2 notes no f16/int8 quantization exists): per-vector
asymmetric min/max quantization to int8, as NATIVE column expressions.
At 100 TB this is the difference between scanning 4 bytes and 1 byte
per dimension — the quantized table is the one the ANN probes scan;
full-precision vectors are fetched only for the final re-rank of the
top candidates (the standard two-stage retrieval layout).

Scheme (deterministic, oracle-reproducible — floor, not round, so no
tie-breaking mode ambiguity across engines):
    qmin  = min(v), qmax = max(v), scale = (qmax - qmin) / 255
    code_i = least(255, floor((v_i - qmin) / scale))   [0 when scale=0]
    dequant_i = qmin + code_i * scale
Max per-element error is one scale step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quant_min(v) -> Column:
    return F.array_min(F.transform(_c(v), lambda x: x.cast("double")))


def quant_scale(v) -> Column:
    v = _c(v)
    return (F.array_max(F.transform(v, lambda x: x.cast("double"))) - quant_min(v)) / 255.0


def quantize_with(v, mn, sc) -> Column:
    """array<float> -> int8 codes given ALREADY-COMPUTED (min, scale)
    columns; constant vectors (scale 0) map to all-zero codes. Keeping
    min/scale as real columns matters: embedding their aggregations
    inside the per-element lambda re-evaluates a full array pass per
    element — O(d²) per row (measured ~2x on the quantized knn)."""
    v, mn, sc = _c(v), _c(mn), _c(sc)

    def to_signed_byte(x):
        # unsigned code in [0, 255] -> two's-complement tinyint (ANSI
        # mode rejects a plain cast above 127)
        c = F.least(
            F.lit(255.0), F.floor((x.cast("double") - mn) / sc).cast("double")
        ).cast("int")
        return F.when(c > 127, c - 256).otherwise(c).cast("tinyint")

    return F.when(
        sc == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    ).otherwise(F.transform(v, to_signed_byte))


def quantize(v) -> Column:
    """Standalone codes column (recomputes min/scale inline — prefer
    ``with_quantized``/``quantize_with`` in pipelines, see above)."""
    v = _c(v)
    return quantize_with(v, quant_min(v), quant_scale(v))


def dequantize(codes, mn, scale) -> Column:
    """int8 codes + (min, scale) -> array<double> approximation.

    Codes are stored as signed tinyint; recover the unsigned value with
    a +256 wrap for negatives."""
    return F.transform(
        _c(codes),
        lambda q: _c(mn)
        + (q.cast("int") + F.when(q.cast("int") < 0, 256).otherwise(0)).cast("double")
        * _c(scale),
    )


def with_quantized(df, vec_col: str = "embedding", prefix: str = "q"):
    """Attach (q_min, q_scale, q_codes) columns — the compact layout a
    quantized table persists instead of the float vectors. min/scale are
    materialized as columns FIRST and the codes reference them, so each
    is one array pass per row (multi-use aliases stop Catalyst's project
    collapse from re-inlining the aggregations into the code lambda)."""
    v = F.col(vec_col)
    out = df.withColumn(f"{prefix}_min", quant_min(v)).withColumn(
        f"{prefix}_scale", quant_scale(v)
    )
    return out.withColumn(
        f"{prefix}_codes",
        quantize_with(v, F.col(f"{prefix}_min"), F.col(f"{prefix}_scale")),
    )
