"""Benchmark decontamination for training-data pipelines.

Beyond-reference surface (task north star): before pretraining, every
document that shares a long word n-gram with an evaluation/benchmark
set must be flagged or dropped — the GPT-3-style 13-gram overlap filter
(Brown et al. 2020, appendix C; also used by Gopher and The Pile).

Spark-first shape: the eval set is reduced to a DISTINCT set of
portable 64-bit gram hashes (tiny relation — benchmarks are KBs-to-MBs
next to a 100 TB corpus), which is broadcast; the corpus side explodes
its own grams, hashes each once, and LEFT SEMI joins against the
broadcast — so the only shuffle in the whole operator is the final
per-document count keyed on the document id, carrying one skinny row
per *matched* gram (almost always none). Nothing corpus-sized is ever
collected or re-shuffled; the plan is scan → explode → broadcast-semi
→ partial-count → merge. Every step is hash/aggregate algebra on the
same md5-based hash the rest of the text suite uses, so the operator
has an exact ANSI-SQL oracle.

Short-text semantics: texts with fewer than ``n`` tokens have no
n-gram. On the EVAL side the whole token sequence is used as a single
fallback gram (a short benchmark prompt should still decontaminate
exact copies); on the CORPUS side short documents match only via that
same whole-text gram. Both sides share one gram generator so the
fallback is symmetric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kowari_spark.functions.text import _c, base_hash64, tokens
from kowari_spark.operators.quality import word_ngrams


def contamination_grams(text, n: int) -> Column:
    """Word n-grams for overlap matching; texts shorter than ``n``
    tokens contribute their whole text as a single fallback gram, so
    exact copies of short benchmark prompts are still caught."""
    grams = word_ngrams(_c(text), n)
    return F.when(F.size(grams) > 0, grams).otherwise(F.array(_c(text)))


def ngram_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag corpus documents that share any word ``n``-gram with the
    evaluation set.

    Returns one row per input document:

    - ``contam_grams`` — number of DISTINCT grams of the document that
      appear anywhere in the eval set;
    - ``total_grams`` — the document's distinct gram count;
    - ``contam_frac`` — their ratio, rounded to 6 decimals;
    - ``is_contaminated`` — ``contam_grams > 0`` (the drop filter).

    ``broadcast_eval=True`` (default) broadcasts the distinct eval gram
    hashes — correct whenever the benchmark set is small relative to
    the corpus, which is the decontamination regime; pass ``False`` to
    let the planner shuffle both sides for a genuinely huge eval set.
    """
    eval_text = eval_text_col or text_col
    eval_grams = (
        eval_df.select(
            F.explode(contamination_grams(F.col(eval_text), n)).alias("__g")
        )
        .select(base_hash64(F.col("__g")).alias("__h"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)

    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(contamination_grams(F.col(text_col), n))
        ).alias("__g"),
    ).select(id_col, base_hash64(F.col("__g")).alias("__h"))

    totals = doc_grams.groupBy(id_col).agg(F.count("*").alias("total_grams"))
    matched = (
        doc_grams.join(eval_grams, "__h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("contam_grams"))
    )
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(matched, id_col, "left")
        .select(
            id_col,
            F.coalesce("contam_grams", F.lit(0)).alias("contam_grams"),
            F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
            (
                F.round(
                    F.coalesce(
                        F.col("contam_grams") / F.col("total_grams"), F.lit(0.0)
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("contam_frac"),
            (F.coalesce("contam_grams", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )
