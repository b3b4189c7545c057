"""Deduplication operators for training-data pipelines.

Beyond-reference surface (task north star): exact dedup, MinHash+LSH
near-dedup, SimHash, n-gram Jaccard verification, and embedding-cosine
near-dup — each designed as a shuffle-conscious DataFrame pipeline:

- exact: hash-groupBy (one shuffle on the content hash, map-side partial
  aggregation free from Catalyst);
- MinHash LSH: shingle -> signature (narrow, codegen) -> explode bands
  (|docs|·b rows) -> self-join on (band, key) — the join key is the band
  bucket so the shuffle moves only (id, band_key) pairs, never documents;
- verification joins shingle sets back ONLY for candidate pairs
  (candidate set << n²);
- embedding near-dup: exact O(n²) variant for oracles/small n, LSH-bucket
  variant as the 100 TB path (pairs only form inside a bucket).

All hashing is md5-based and engine-portable so every operator has an
exact DuckDB oracle (see functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kowari_spark.functions.text import (
    MINHASH_P,
    base_hash64,
    fingerprint_key,
    minhash_params,
    shingles,
)


# -- exact ------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact content group.

    Content key = md5 of the concatenated columns; one shuffle, with
    map-side partial min/count."""
    key = F.md5(F.concat_ws("", *[F.col(c) for c in content_cols]))
    keyed = df.withColumn("__key", key)
    keep = keyed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, ["__key", id_col], "left_semi").drop("__key")


def exact_dup_groups(
    df: DataFrame, content_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Groups with >1 identical rows: (content_key, n_dups, keep_id)."""
    key = F.md5(F.concat_ws("", *[F.col(c) for c in content_cols]))
    return (
        df.withColumn("content_key", key)
        .groupBy("content_key")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


# -- MinHash + LSH ----------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Whole-table minhash signatures in the shape that scales: explode
    shingles (narrow), hash each shingle ONCE, then ``groupBy(id)`` with
    ``num_hashes`` ``min()`` aggregates — map-side partial mins make the
    shuffle carry one row per (doc, shingle) of just (id, hash), and the
    generated code stays tiny (the naive nested-array form recomputes
    md5 num_hashes× per shingle and blows up codegen).

    Output: (id_col, m0..m{num_hashes-1}).
    """
    a, b = minhash_params(num_hashes, seed)
    exploded = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("__sh"),
    ).select(
        id_col, (base_hash64(F.col("__sh")) % F.lit(MINHASH_P)).alias("__m")
    )
    aggs = [
        F.min((F.lit(ai) * F.col("__m") + F.lit(bi)) % F.lit(MINHASH_P)).alias(f"m{i}")
        for i, (ai, bi) in enumerate(zip(a, b))
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs: ids sharing at least one LSH band.

    Signature of ``num_hashes`` minhashes split into ``bands`` bands of
    r = num_hashes/bands rows; band key = md5 of the band's values.
    Output: (id_a, id_b) with id_a < id_b, distinct. The band self-join
    shuffles only (id, band_key) pairs — documents never move.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    banded = sig.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws(",", *[F.col(f"m{i * r + j}") for j in range(r)]))
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_key"),
        # lazy checkpoint: the signature subtree (shingle explode +
        # num_hashes mins) feeds both sides of the band self-join —
        # compute it once, not per side
    ).localCheckpoint(eager=False)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for given (id_a, id_b) pairs.

    Shingle sets are computed ONLY for documents that appear in a
    candidate pair (semi-join pruning) — the candidate set is far
    smaller than the corpus, so verification cost tracks |pairs|, not n."""
    ids_a = pairs.select(F.col("id_a").alias(id_col))
    ids_b = pairs.select(F.col("id_b").alias(id_col))

    def _side(ids, out_id, out_sh):
        pruned = df.join(ids.distinct(), id_col, "left_semi")
        return pruned.select(
            F.col(id_col).alias(out_id),
            shingles(F.col(text_col), shingle_n).alias(out_sh),
        )

    a = _side(ids_a, "id_a", "sh_a")
    b = _side(ids_b, "id_b", "sh_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact Jaccard >= t."""
    cand = minhash_band_pairs(df, text_col, id_col, num_hashes, bands, shingle_n, seed)
    return jaccard_pairs(df, cand, text_col, id_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


# -- SimHash ----------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Whole-table SimHash in the aggregation shape that scales: explode
    tokens, hash each ONCE, then ``bits`` tiny sum() aggregates (map-side
    partial) counting set bits; fingerprint bit j is set when ones_j
    outvote zeros. Same values as the ``functions.text.simhash`` Column
    form, which recomputes the token-hash array per bit and blows up
    codegen at 32 bits."""
    from kowari_spark.functions.text import tokens

    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(id_col, base_hash64(F.col("__t")).alias("__h"))
    aggs = [
        F.sum(F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1))).alias(f"__b{j}")
        for j in range(bits)
    ] + [F.count("*").alias("__n")]
    per = exploded.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(
            F.col(f"__b{j}") * 2 > F.col("__n"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    block_bits: int = 8,
) -> DataFrame:
    """Near pairs by SimHash hamming distance <= max_hamming.

    Scale path: block on the top ``block_bits`` bits (near docs very
    likely share them), join within blocks, then exact popcount filter —
    avoids the full n² comparison. bit_count is a built-in in both
    engines."""
    fp = simhash_fingerprints(df, text_col, id_col, bits)
    # lazy checkpoint: the fingerprint aggregation feeds both sides of
    # the blocked self-join — compute it once, not per side
    blocked = fp.withColumn(
        "block", F.shiftright(F.col("simhash"), bits - block_bits)
    ).localCheckpoint(eager=False)
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# -- fingerprint dedup -------------------------------------------------------

def fingerprint_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token-set fingerprint groups (order/duplication-insensitive)."""
    return (
        df.select(F.col(id_col), fingerprint_key(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n") > 1)
    )


# -- duplicate clustering ----------------------------------------------------

def _cc_star(canon: DataFrame, max_iter: int) -> DataFrame:
    """Star-contraction connected components (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): alternating large-star /
    small-star rounds converge in O(log² n) rounds INDEPENDENT of graph
    diameter. Input: canonical edges (hi > lo), checkpointed. Output:
    star edges (node, component-min) for every non-root node.

    - large-star: every node points its larger neighbors at the minimum
      of its neighborhood (long chains collapse geometrically);
    - small-star: every node and its smaller neighbors re-attach to that
      minimum, keeping edges canonical (hi > lo).

    Convergence detection is two-stage: a cheap edge-set signature
    (count + hash sum) screens each round, and a signature match is then
    CONFIRMED with an exact symmetric-difference check (two anti-join
    emptiness probes on the already-checkpointed edge sets) — a hash
    collision can no longer end the contraction early. Exhausting
    ``max_iter`` without a confirmed fixpoint raises a warning: the
    returned labels may still be mid-contraction."""
    import warnings

    prev_sig = None
    prev_canon = None
    converged = False
    for _ in range(max_iter):
        sym = canon.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(canon.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mn = sym.groupBy("u").agg(F.min("v").alias("mv"))
        # no distinct here: duplicate (hi, lo) rows collapse in the
        # small-star groupBy/distinct below — one less shuffle per round
        ls = (
            sym.join(mn, "u")
            .withColumn("m", F.least(F.col("u"), F.col("mv")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        )
        mn2 = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        j = ls.join(mn2, "hi")
        # lazy checkpoint: lineage truncates and the round's result is
        # cached, but the blocking action is the signature aggregate
        # below — ONE driver barrier per round instead of two
        canon = (
            j.filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(j.select("hi", F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        sig = tuple(
            canon.agg(
                F.count("*").alias("n"), F.sum(F.hash("hi", "lo")).alias("h")
            ).first()
        )
        if sig == prev_sig and prev_canon is not None:
            # exact confirmation of the signature match: both sets are
            # localCheckpoint'ed, so the two anti-joins replay no lineage
            if (
                canon.join(prev_canon, ["hi", "lo"], "left_anti").isEmpty()
                and prev_canon.join(canon, ["hi", "lo"], "left_anti").isEmpty()
            ):
                converged = True
                break
        prev_sig = sig
        prev_canon = canon
    if not converged:
        warnings.warn(
            f"_cc_star: no fixpoint within max_iter={max_iter} rounds; "
            "components may be incompletely contracted — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return canon


def _cc_propagate(canon: DataFrame, max_iter: int):
    """Min-label propagation (one hop per round, 2 shuffles per round):
    cheapest per round, needs O(diameter) rounds. Returns
    (labels (id, label), converged) — caller must finish with star
    contraction when not converged."""
    edges = canon.select(
        F.col("hi").alias("src"), F.col("lo").alias("dst")
    ).unionByName(canon.select(F.col("lo").alias("src"), F.col("hi").alias("dst")))
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_label"))
        )
        # lazy checkpoint: the changed-count probe below is the single
        # blocking action that materializes (and caches) the round
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                labels.id,
                F.least(
                    labels.label, F.coalesce(F.col("nbr_label"), labels.label)
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    return labels, converged


# edge sets at or below this size route to propagation first in "auto"
# mode: its 2-shuffle rounds beat star contraction's ~5 whenever the
# graph is shallow, and the unconverged fall-through keeps correctness
_CC_SMALL_EDGES = 65536


def dedup_clusters(
    pairs: DataFrame, max_iter: int = 20, algorithm: str = "auto"
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id) where
    cluster_id = min id reachable through the pair graph.

    Near-dup relations aren't transitive, but dedup treats them so (one
    survivor per component — the standard MinHash-dedup final step).

    Adaptive algorithm choice (the edge count is a free aggregate on the
    checkpointed edge list):

    - big edge sets (or ``algorithm="star"``): large-star/small-star
      contraction — O(log² n) rounds independent of diameter, the only
      shape that survives a 100 TB high-diameter graph;
    - small edge sets (``algorithm="auto"``, <= 64k edges): min-label
      propagation — 2 shuffles/round beats star's ~5 on the shallow
      graphs near-dup clusters actually form; if it has NOT converged
      within ``max_iter`` hops (adversarially deep small graph), the
      partially-contracted graph (edges relabeled through the current
      labels) is finished by star contraction and the labels composed,
      so the result is exact for every input.

    localCheckpoint materializes the input edge list once (it is
    typically the tail of an expensive minhash/jaccard pipeline) and
    truncates per-round lineage so plans don't grow with iterations.
    """
    canon0 = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("hi"),
            F.least("id_a", "id_b").alias("lo"),
        )
        .distinct()
        .localCheckpoint()
    )
    canon = canon0.filter(F.col("hi") != F.col("lo"))
    all_nodes = (
        canon0.select(F.col("hi").alias("id"))
        .unionByName(canon0.select(F.col("lo").alias("id")))
        .distinct()
    )

    def _finish(star_edges: DataFrame) -> DataFrame:
        child = star_edges.select(
            F.col("hi").alias("id"), F.col("lo").alias("cluster_id")
        )
        roots = all_nodes.join(
            star_edges.select(F.col("hi").alias("id")), "id", "left_anti"
        ).select("id", F.col("id").alias("cluster_id"))
        return child.unionByName(roots)

    if algorithm == "star" or (
        algorithm == "auto" and canon0.count() > _CC_SMALL_EDGES
    ):
        return _finish(_cc_star(canon, max_iter))

    labels, converged = _cc_propagate(canon, max_iter)
    if converged:
        nodes_lab = labels.select("id", F.col("label").alias("cluster_id"))
        lonely = all_nodes.join(labels.select("id"), "id", "left_anti").select(
            "id", F.col("id").alias("cluster_id")
        )
        return nodes_lab.unionByName(lonely)
    # not converged: contract edges through the partial labels and let
    # star contraction finish on the (far smaller) quotient graph, then
    # compose node -> partial label -> component min
    la = labels.select(F.col("id").alias("hi"), F.col("label").alias("ha"))
    lb = labels.select(F.col("id").alias("lo"), F.col("label").alias("hb"))
    quotient = (
        canon.join(la, "hi")
        .join(lb, "lo")
        .select(
            F.greatest("ha", "hb").alias("hi"), F.least("ha", "hb").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    star = _cc_star(quotient, max_iter)
    root_of = star.select(F.col("hi").alias("label"), F.col("lo").alias("root"))
    nodes_lab = labels.join(root_of, "label", "left").select(
        "id", F.coalesce(F.col("root"), F.col("label")).alias("cluster_id")
    )
    lonely = all_nodes.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("cluster_id")
    )
    return nodes_lab.unionByName(lonely)


def dedup_keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 20
) -> DataFrame:
    """Drop every clustered document except its cluster's min-id
    representative; documents in no near-dup pair survive untouched."""
    clusters = dedup_clusters(pairs, max_iter)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# -- embedding near-dup ------------------------------------------------------

def _pair_cosine() -> Column:
    """cos(va, vb) from PREcomputed norms na/nb: each vector's norm is
    computed once per row upstream, not once per pair — at n² pairs the
    naive form does 3× the array math. Same expression shape as the
    reference/oracle (dot / (sqrt·sqrt), 0.0 on zero norm)."""
    from kowari_spark.functions.vector import dot

    return F.when(
        (F.col("na") == F.lit(0.0)) | (F.col("nb") == F.lit(0.0)), F.lit(0.0)
    ).otherwise(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))


def embedding_near_dups(
    df: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine near-dup (id_a < id_b, cos >= t).

    O(n²) — the oracle-checkable baseline. Use
    ``embedding_near_dups_lsh`` as the scale path."""
    from kowari_spark.functions.vector import magnitude

    normed = df.select(
        F.col(id_col), F.col(vec_col), magnitude(F.col(vec_col)).alias("__n")
    )
    a = normed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("__n").alias("na")
    )
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("__n").alias("nb")
    )
    cos = _pair_cosine()
    if round_to is not None:
        cos = F.round(cos, round_to) + F.lit(0.0)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _sign_buckets_col(vec_col, dim: int, num_planes: int, num_tables: int,
                      seed: int, hasher: str):
    """Per-table sign-LSH bucket array (array<long>) under the chosen
    hasher. Plane construction — seeds ``seed..seed+T-1`` — matches
    MultiSignLSH exactly, so ``hasher="gemm"`` reuses its GEMM kernel:
    one float64 matmul per Arrow batch instead of T·p interpreted
    aggregate/zip_with folds per row, the measured hash bottleneck of
    the x1000 scale bench (bucket-for-bucket parity tested there)."""
    from kowari_spark.operators.lsh import MultiSignLSH, SignLSH

    if hasher == "gemm":
        ml = MultiSignLSH(dim=dim, num_planes=num_planes,
                          num_tables=num_tables, seed=seed, hasher="gemm")
        col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        return ml.buckets_gemm_udf()(col)
    if hasher != "expr":
        raise ValueError(f"hasher must be expr|gemm, got {hasher!r}")
    return F.array(
        *[
            SignLSH(dim=dim, num_planes=num_planes, seed=seed + t).bucket_expr(vec_col)
            for t in range(num_tables)
        ]
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    left_id: str = "id",
    right_id: str = "id",
    vec_col: str = "embedding",
    round_to: int | None = None,
    dim: int | None = None,
    hasher: str = "expr",
) -> DataFrame:
    """Approximate two-table similarity join (spark.ml
    approxSimilarityJoin equivalent, SURVEY.md §2.6 "Joins"): all
    (left, right) pairs with cosine >= threshold, found via sign-LSH
    OR-construction over ``num_tables`` independent plane sets.

    Both sides hash with the SAME planes, so true near pairs collide
    with probability 1-(1-p^planes)^tables; each table's equi-join on
    (table, bucket) shuffles only (id, bucket) pairs. Verification joins
    vectors back for the candidate set only. Output: (left_id, right_id,
    cos).

    Pass ``dim`` when the caller knows the vector dimension (a
    Collection always does) — the ``first()`` fallback costs one Spark
    job per invocation (ADVICE r5). ``hasher="gemm"`` swaps the bucket
    expressions for the MultiSignLSH GEMM kernel (identical buckets,
    one matmul per Arrow batch — the big-corpus hash path).
    """
    from kowari_spark.functions.vector import magnitude

    if dim is None:
        dim = len(left.select(vec_col).first()[0])
    buckets = _sign_buckets_col(vec_col, dim, num_planes, num_tables,
                                seed, hasher)

    def _bucketed(df, id_col, out):
        return df.select(
            F.col(id_col).alias(out), F.posexplode(buckets).alias("__tbl", "bucket")
        )

    cand = (
        _bucketed(left, left_id, "__lid")
        .join(_bucketed(right, right_id, "__rid"), ["__tbl", "bucket"])
        .select("__lid", "__rid")
        .distinct()
    )

    def _normed(df, id_col, out_id, out_vec, out_norm):
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            magnitude(F.col(vec_col)).alias(out_norm),
        )

    la = _normed(left, left_id, "__lid", "va", "na")
    rb = _normed(right, right_id, "__rid", "vb", "nb")
    cos = _pair_cosine()
    if round_to is not None:
        cos = F.round(cos, round_to) + F.lit(0.0)
    return (
        cand.join(la, "__lid")
        .join(rb, "__rid")
        .select(
            F.col("__lid").alias(left_id + "_l"),
            F.col("__rid").alias(right_id + "_r"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dups_lsh(
    df: DataFrame,
    threshold: float,
    num_planes: int = 4,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_to: int | None = None,
    dim: int | None = None,
    hasher: str = "expr",
) -> DataFrame:
    """Approximate near-dup via sign-LSH OR-construction: ``num_tables``
    independent plane sets; a pair becomes a candidate when it collides
    in ANY table (recall 1-(1-p^planes)^tables, p = 1 - θ/π). Each
    table's join shuffles by bucket, so candidate pairs only form inside
    buckets — never the n² explosion. This is the 100 TB path; the exact
    variant above is the oracle baseline.

    Pass ``dim`` when known (a Collection always knows) — the
    ``first()`` fallback costs one Spark job per invocation (ADVICE
    r5). ``hasher="gemm"`` hashes with the MultiSignLSH GEMM kernel
    (identical buckets, one matmul per Arrow batch)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    # all tables' buckets in ONE pass over the data: posexplode the
    # per-table bucket array, then a single (table, bucket) self-join —
    # instead of num_tables scans + joins + a union
    buckets = _sign_buckets_col(vec_col, dim, num_planes, num_tables,
                                seed, hasher)
    bucketed = df.select(
        F.col(id_col), F.posexplode(buckets).alias("__tbl", "bucket")
    )
    a = bucketed.select(F.col(id_col).alias("id_a"), "__tbl", "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), "__tbl", "bucket")
    cand = (
        a.join(b, ["__tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    from kowari_spark.functions.vector import magnitude

    normed = df.select(
        F.col(id_col), F.col(vec_col), magnitude(F.col(vec_col)).alias("__n")
    )
    va = normed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("__n").alias("na")
    )
    vb = normed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("__n").alias("nb")
    )
    cos = _pair_cosine()
    if round_to is not None:
        cos = F.round(cos, round_to) + F.lit(0.0)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def winnow_pairs(
    df: DataFrame,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-robust near-dup candidates via winnowing
    (functions/text.winnow_fingerprints): documents sharing at least
    ``min_shared`` selected fingerprints. Unlike minhash (whole-document
    set similarity) this catches documents that share a long RUN of
    tokens — boilerplate, quoted passages, templated text — because any
    common token run of length >= window + k - 1 is guaranteed a shared
    fingerprint.

    Scale shape: candidate pairs only form inside fingerprint groups
    (equi-join on the fingerprint hash), never all-pairs; the per-doc
    fingerprint count is ~2/(window+1) of its token count, so the join
    input is a tunable fraction of the corpus."""
    from pyspark.sql.window import Window

    from kowari_spark.functions.text import base_hash64, winnow_grams

    # aggregation form (same values as functions.text.winnow_fingerprints,
    # pinned by drift-guard test): posexplode grams, hash each ONCE, then
    # a sliding rowsBetween window min — the nested-Column form would
    # re-evaluate the gram-hash array per window element (O(T·window)
    # md5 per doc; measured 30x slower at sf0.01)
    grams = df.select(
        F.col(id_col),
        F.posexplode(winnow_grams(F.col(text_col), k)).alias("__pos", "__g"),
    )
    hashed = grams.select(id_col, "__pos", base_hash64(F.col("__g")).alias("__h"))
    wpart = Window.partitionBy(id_col)
    wslide = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(0, window - 1)
    fps = (
        hashed.withColumn("__n", F.count("*").over(wpart))
        .withColumn("fp", F.min("__h").over(wslide))
        # valid window START positions only (0-based): 0..max(n-window, 0)
        .filter(F.col("__pos") <= F.greatest(F.col("__n") - window, F.lit(0)))
        .select(F.col(id_col), "fp")
        .distinct()
        # lazy checkpoint: the fingerprint subtree (posexplode + md5 +
        # two windows + distinct) feeds BOTH sides of the self-join and
        # Spark does not reuse it across them (verified: 2 Generates,
        # 4 Windows in the executed plan) — cache it, compute once
        .localCheckpoint(eager=False)
    )
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# -- semantic dedup (SemDeDup) ----------------------------------------------

def _semantic_pairs_gemm(
    normed: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    round_to: int | None,
) -> DataFrame:
    """Cell-local GEMM pair scorer: each cluster's pairwise cosine
    matrix is ONE numpy V·Vᵀ inside ``applyInPandas`` — the expression
    engine's per-pair interpreted fold is the bottleneck at scale (the
    same Python/JVM boundary the LSH GEMM hasher and HNSW GEMM refine
    sit behind). Results are IDENTICAL to the expression engine: the
    GEMM only SELECTS candidates (with a margin wider than its ~d·eps
    float error), every candidate is then re-scored with the exact
    sequential (x·y) fold and decimal HALF_UP rounding the expression
    plan computes, so the emitted (id_a, id_b, cos) set matches
    bit-for-bit (parity-tested). Only the skinny surviving pairs ever
    leave the worker."""
    import numpy as np
    import pandas as pd

    from kowari_spark.numerics import round_half_up

    id_type = normed.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos double"
    # a rounded cos >= t implies the raw cos >= t - 0.5*10^-round_to;
    # widen by 1e-9 (>> the GEMM's accumulated float error at any sane
    # dimension) so no expression-engine pair can escape selection
    margin = (0.5 * 10.0 ** (-round_to) if round_to is not None else 0.0) + 1e-9

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_list()).astype(np.float64)
        nn = pdf["__n"].to_numpy(dtype=np.float64)
        denom = np.outer(nn, nn)
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.where(denom == 0.0, 0.0, (V @ V.T) / denom)
        ia, ib = np.triu_indices(len(ids), 1)
        sel = C[ia, ib] >= threshold - margin
        ia, ib = ia[sel], ib[sel]
        if len(ia) == 0:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                 "cos": np.zeros(0)})
        # exact rescore of the candidates: accumulate dimension-by-
        # dimension (one vectorized elementwise op per dim), which is
        # the SAME sequential left fold the expression engine runs —
        # each candidate's value is bit-identical to aggregate(zip_with)
        acc = np.zeros(len(ia), dtype=np.float64)
        for d in range(V.shape[1]):
            acc += V[ia, d] * V[ib, d]
        dsel = nn[ia] * nn[ib]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where((nn[ia] == 0.0) | (nn[ib] == 0.0), 0.0, acc / dsel)
        if round_to is not None:
            cos = np.fromiter(
                (round_half_up(float(c), round_to) + 0.0 for c in cos),
                dtype=np.float64, count=len(cos),
            )
        keep = cos >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos": cos[keep]}
        )

    return normed.groupBy("list_id").applyInPandas(score, out_schema)


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    ivf=None,
    round_to: int | None = 6,
    max_iter_cc: int = 20,
    scorer: str = "expr",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    semantic deduplication — cluster the corpus with k-means, compare
    pairs only WITHIN a cluster, connect near-duplicates, keep one
    representative per component.

    Returns one row per input: (id_col, list_id, rep_id, is_kept) —
    ``rep_id`` is the min-id member of the row's near-dup component
    (itself when un-duplicated), ``is_kept`` the survivor flag, so both
    the keep-filter and the dup-audit read off the same output.

    Spark shape and why it scales: the quadratic step is confined to
    single clusters — the self-join keys on ``list_id``, so each cell's
    pair generation is cluster-local work after ONE hash shuffle, never
    an all-pairs cross join (that confinement is the SemDeDup algorithm
    itself; size ``n_lists`` so cells fit a task, growing it with the
    corpus). The k-means fit is the deterministic seeded IVF quantizer
    (one seeding collect, Lloyd updates shuffling n_lists*d partial
    sums); vector norms are computed once per row before the join; the
    assigned+normed relation is lazily checkpointed so the self-join
    doesn't recompute assignment per side; components use the adaptive
    CC operator (label propagation with star-contraction fall-through).

    A fitted ``ivf`` (operators/ivf.IVF) can be passed to reuse an
    existing quantizer; otherwise one is fitted with ``n_lists`` cells,
    centroids on the 1e-6 decimal grid (cross-engine parity), sampled
    seeding. Cosines are rounded to ``round_to`` before the threshold
    compare so the keep/drop decision is engine-portable.

    ``scorer="expr"`` (default) scores pairs with the pure-expression
    plan (exact SQL oracle); ``scorer="gemm"`` computes each cell's
    pair matrix as one numpy GEMM in ``applyInPandas`` with an exact
    sequential-fold rescore of candidates — bit-identical pairs
    (parity-tested), and the scale path once cells hold thousands of
    vectors (the interpreted per-pair fold dominates the expr plan).
    """
    from kowari_spark.functions.vector import magnitude
    from kowari_spark.operators.ivf import IVF

    if "list_id" in df.columns:
        # a prebuilt IVF layout (ivf.load) arrives pre-assigned — reuse
        # its cells instead of re-running the quantizer expression
        assigned = df.select(id_col, vec_col, "list_id")
    else:
        if ivf is None:
            ivf = IVF(n_lists=n_lists, round_centroids=6)
        if ivf.centroids is None:
            ivf.fit(df, id_col=id_col, vec_col=vec_col)
        assigned = ivf.with_lists(df.select(id_col, vec_col), vec_col)
    normed = assigned.select(
        F.col(id_col),
        "list_id",
        F.col(vec_col),
        magnitude(F.col(vec_col)).alias("__n"),
    ).localCheckpoint(eager=False)

    if scorer == "gemm":
        pairs = _semantic_pairs_gemm(
            normed, float(threshold), id_col, vec_col, round_to
        )
    elif scorer == "expr":
        a = normed.select(
            "list_id", F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"), F.col("__n").alias("na"),
        )
        b = normed.select(
            "list_id", F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"), F.col("__n").alias("nb"),
        )
        cos = _pair_cosine()
        if round_to is not None:
            cos = F.round(cos, round_to) + F.lit(0.0)
        pairs = (
            a.join(b, "list_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cos"))
            .filter(F.col("cos") >= F.lit(float(threshold)))
        )
    else:
        raise ValueError(f"scorer must be expr|gemm, got {scorer!r}")

    cc = dedup_clusters(pairs, max_iter_cc)
    return (
        normed.select(id_col, "list_id")
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            "list_id",
            F.coalesce("cluster_id", F.col(id_col)).alias("rep_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias(
                "is_kept"
            ),
        )
    )
