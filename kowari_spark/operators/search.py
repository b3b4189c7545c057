"""BM25 full-text keyword search over a document corpus.

Beyond-reference surface (task north star: query capabilities a corpus
engine needs): rank documents for a keyword query with Okapi BM25
(Robertson & Walker 1994) — the classic inverted-index scoring function
— expressed as pure DataFrame aggregation so Catalyst keeps the whole
plan in codegen.

Spark-first shape (the "inverted index on demand" plan):

1. ONE projection per document computes its length AND its
   query-term-filtered token array (native higher-order filter), drops
   non-matching documents before anything explodes, and carries the
   length through the tf aggregation — so the corpus text is scanned
   exactly twice (matching pass + corpus-stats aggregate), there is no
   per-document length join, and only matching-term rows ever shuffle;
2. term frequencies aggregate per (doc, term) with map-side partial
   counts; document frequencies reduce from that relation (≤ |query|
   rows) and come back via a broadcast join;
3. corpus statistics (N, avg document length) are one scalar aggregate
   broadcast into the scoring expression;
4. the final per-document score sums each term's contribution in FIXED
   query-term order via one conditional aggregate per term — float
   addition is not associative, so a bare SUM over an unordered group
   would be nondeterministic across partitionings and engines; the
   pivoted form makes the fold order part of the plan;
5. top-k resolves as orderBy(score desc, id).limit(k) —
   TakeOrderedAndProject, no global sort.

The per-term idf is rounded before use so the score is reproducible
across engines (ln() may differ in the last ulp between libm
implementations); the whole operator then has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kowari_spark.functions.text import token_count, tokens


def _bm25_core(docs, qterms, text_col, id_col, k1, b):
    """Shared single/batch plan core: the fused matching projection
    (doc length + query-term-filtered token array in ONE pass, drop
    non-matching docs before exploding), the lazily-checkpointed tf
    relation, document frequencies, corpus stats, and the per-term
    contribution expression. The single and batch paths differ ONLY in
    how contributions fold per document, so their documented bit-parity
    cannot drift."""
    toks = tokens(F.col(text_col))
    qarr = F.array(*[F.lit(t) for t in qterms])
    matches = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("__dl"),
        F.filter(toks, lambda t: F.array_contains(qarr, t)).alias("__mt"),
    ).filter(F.size("__mt") > 0)
    tf = (
        matches.select(id_col, "__dl", F.explode("__mt").alias("__t"))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count("*").alias("__tf"))
        # lazy checkpoint: the skinny tf relation feeds BOTH the df
        # reduction and the scoring join — materialize it once instead
        # of re-scanning the corpus text per consumer
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    stats = docs.agg(
        F.count("*").alias("__n"),
        (
            F.sum(token_count(F.col(text_col))).cast("double") / F.count("*")
        ).alias("__avgdl"),
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
        ),
        9,
    )
    contrib = idf * (
        F.col("__tf")
        * (k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1)
            * (1.0 - b + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    return tf, dfreq, stats, contrib


def bm25_search(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25.

    Returns (id_col, bm25, n_terms) — score rounded to ``round_to``
    decimals, ``n_terms`` = how many distinct query terms the document
    contains. Ties break on ascending id, so results are total-ordered.

    score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) /
                  (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    with idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)), idf rounded
    to 9 decimals (cross-engine ln() parity).
    """
    qterms = sorted({t for t in query.split(" ") if t})
    if not qterms:
        raise ValueError("query has no terms")

    tf, dfreq, stats, contrib = _bm25_core(docs, qterms, text_col, id_col, k1, b)
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "__t", contrib.alias("__c"))
    )
    # one conditional aggregate per query term = deterministic fold order
    per_term = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("__t") == t, F.col("__c"))).alias(f"__c{i}")
            for i, t in enumerate(qterms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(qterms)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    n_terms = sum(
        F.when(F.col(f"__c{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(qterms))
    )
    return (
        per_term.select(
            id_col,
            (F.round(score, round_to) + F.lit(0.0)).alias("bm25"),
            n_terms.cast("int").alias("n_terms"),
        )
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    query: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """The exact DuckDB replay of :func:`bm25_search` (same fixed-order
    term fold, same rounded idf)."""
    qterms = sorted({t for t in query.split(" ") if t})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in qterms)
    contribs = " + ".join(f"COALESCE(c{i}, 0.0)" for i in range(len(qterms)))
    nterms = " + ".join(
        f"CASE WHEN c{i} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(len(qterms))
    )
    cases = ",\n         ".join(
        "SUM(CASE WHEN t = '{}' THEN c END) AS c{}".format(t.replace("'", "''"), i)
        for i, t in enumerate(qterms)
    )
    return f"""
WITH tok AS (SELECT {id_col} AS id, unnest(string_split({text_col}, ' ')) AS t
             FROM {table}),
tf AS (SELECT id, t, COUNT(*) AS tf FROM tok
       WHERE t IN ({in_list}) GROUP BY 1, 2),
dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT COUNT(*) AS n,
                 CAST(SUM(len(string_split({text_col}, ' '))) AS DOUBLE)
                   / COUNT(*) AS avgdl
          FROM {table}),
dl AS (SELECT {id_col} AS id,
              len(string_split({text_col}, ' ')) AS dl FROM {table}),
contrib AS (
  SELECT tf.id, tf.t,
         ROUND(LN(1.0 + (n - df + 0.5) / (df + 0.5)), 9)
           * (tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / avgdl))) AS c
  FROM tf JOIN dfreq USING (t) JOIN dl USING (id) CROSS JOIN stats),
per AS (SELECT id,
         {cases}
        FROM contrib GROUP BY id)
SELECT id AS {id_col},
       ROUND({contribs}, {round_to}) + 0.0 AS bm25,
       CAST({nterms} AS INT) AS n_terms
FROM per
ORDER BY bm25 DESC, {id_col}
LIMIT {k}
"""


def bm25_search_batch(
    docs: DataFrame,
    queries: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` per query for a BATCH of keyword queries — one pass
    over the corpus for any number of queries.

    ``queries`` maps query id -> query string. Returns
    (query_id, id_col, bm25, n_terms, rank), rank 1..k per query,
    ties on ascending document id.

    Plan: the union of all query terms drives ONE matching projection
    (same fused shape as :func:`bm25_search`); the tiny
    (query_id, term) relation joins in as a broadcast; per-(query, doc)
    scores fold term contributions IN SORTED TERM ORDER via an
    array_sort(collect_list(struct(term, contrib))) sequential
    aggregate — the same order the single-query path uses, and adding
    an absent term contributes exactly +0.0 there, so each query's
    scores are bit-identical to ``bm25_search`` run alone
    (parity-tested). Top-k per query is one window."""
    from pyspark.sql.window import Window

    if not queries:
        raise ValueError("queries is empty")
    per_q = {
        qid: sorted({t for t in q.split(" ") if t}) for qid, q in queries.items()
    }
    if any(not ts for ts in per_q.values()):
        raise ValueError("a query has no terms")
    all_terms = sorted({t for ts in per_q.values() for t in ts})

    tf, dfreq, stats, contrib = _bm25_core(
        docs, all_terms, text_col, id_col, k1, b
    )
    # preserve the caller's query-id type (PQ.query_batch convention):
    # let Spark infer it from the dict keys instead of hardcoding string
    # (int keys used to die inside createDataFrame with an opaque type
    # error); the term column stays explicitly string.
    qt = docs.sparkSession.createDataFrame(
        [{"query_id": qid, "__t": t} for qid, ts in per_q.items() for t in ts],
    ).select("query_id", F.col("__t").cast("string").alias("__t"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qt), "__t")
        .select("query_id", id_col, "__t", contrib.alias("__c"))
    )
    # sorted-term sequential fold == the single-query fixed-order fold
    # (absent terms add exactly +0.0 there)
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("__t"), F.col("__c")))),
        F.lit(0.0),
        lambda acc, x: acc + x["__c"],
    )
    per = scored.groupBy("query_id", id_col).agg(
        (F.round(folded, round_to) + F.lit(0.0)).alias("bm25"),
        F.count("*").cast("int").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.col(id_col))
    return (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings,
    id_col: str = "doc_id",
    k0: int = 60,
    weights=None,
    round_to: int = 9,
    max_list_len: int | None = 10000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of any
    number of top-k rankings: score(d) = Σ_i w_i / (k0 + rank_i(d)) —
    the standard hybrid-search combiner (BM25 list + vector list), rank-
    based so the lists' incomparable score scales never need calibrating.

    ``rankings`` is a sequence of ``(df, score_col)`` pairs; each df is
    a TOP-K LIST (id_col + its score column, e.g. ``bm25_search(...)``
    or ``knn(...)`` output). Ranks are derived here as row_number over
    (score DESC, id ASC) — the same total order every producer in this
    repo emits — via a global window: fine by construction because RRF
    consumes top-k lists (k rows each), never whole-corpus relations.
    That precondition is ENFORCED, not assumed: any input list longer
    than ``max_list_len`` rows fails the job with a clear error (an
    in-plan assertion on the derived rank — zero extra jobs on the
    happy path) instead of silently planning a corpus-sized
    single-partition sort. Raise ``max_list_len`` (or pass ``None``
    to disable) for genuinely long lists — after pre-clamping them
    with ``.limit()``. A document missing from a list contributes
    exactly 0.0 from it.

    Scale shape: the fused relation is at most Σ k_i rows. Per-list
    contributions reduce through ONE groupBy with a conditional
    aggregate per list and are added in FIXED list order (float
    addition order is part of the plan, same discipline as the BM25
    term fold), so the operator keeps an exact SQL oracle.

    Returns (id_col, rrf_score, n_lists) — ``n_lists`` = how many input
    lists contained the document — ordered by (rrf_score DESC, id ASC).
    """
    from pyspark.sql.window import Window

    rankings = list(rankings)
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"{len(weights)} weights for {len(rankings)} rankings"
        )
    parts = []
    for i, (df, score_col) in enumerate(rankings):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        rk = F.row_number().over(w).cast("double")
        contrib = F.lit(float(weights[i])) / (F.lit(float(k0)) + rk)
        if max_list_len is not None:
            contrib = F.when(
                rk > float(max_list_len),
                F.raise_error(F.lit(
                    f"rrf_fuse: input list {i} exceeds max_list_len="
                    f"{max_list_len} rows — rrf_fuse consumes TOP-K "
                    "lists, not corpus relations; pre-clamp the list "
                    "with .limit() or raise/disable max_list_len"
                )),
            ).otherwise(contrib)
        parts.append(
            df.select(
                F.col(id_col),
                F.lit(i).alias("__src"),
                contrib.alias("__c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # one conditional aggregate per list = deterministic fold order
    agg = u.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("__src") == i, F.col("__c"))).alias(f"__c{i}")
            for i in range(len(parts))
        ]
    )
    score = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(parts)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    n_lists = sum(
        F.when(F.col(f"__c{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(parts))
    )
    return (
        agg.select(
            id_col,
            (F.round(score, round_to) + F.lit(0.0)).alias("rrf_score"),
            n_lists.cast("int").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
    )
