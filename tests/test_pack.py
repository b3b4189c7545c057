"""Sequence packing (operators/pack.py): invariants, reference parity,
plan shape (the per-stream window must never collapse to a
single-partition exchange)."""

import math

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.pack import pack_documents, pack_summary


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def packed(spark, documents):
    return pack_documents(
        documents, budget=64, num_streams=8
    ).localCheckpoint()


def test_spans_are_contiguous_per_stream(packed):
    """Docs concatenate in ascending-id order: within a stream the spans
    tile [0, total) with no gaps or overlaps."""
    rows = sorted(
        packed.collect(), key=lambda r: (r["stream"], r["doc_id"])
    )
    pos = {}
    for r in rows:
        expect = pos.get(r["stream"], 0)
        assert r["start_pos"] == expect
        assert r["end_pos"] == r["start_pos"] + r["n_tokens"]
        assert r["n_tokens"] >= 1  # empty text still packs one token
        pos[r["stream"]] = r["end_pos"]


def test_chunk_range_matches_span(packed):
    for r in packed.collect():
        assert r["first_chunk"] == r["start_pos"] // 64
        assert r["last_chunk"] == (r["end_pos"] - 1) // 64
        assert r["first_chunk"] <= r["last_chunk"]


def test_deterministic_and_total(spark, documents, packed):
    """Same corpus -> same packing (pure function of ids + counts), and
    every input document gets exactly one row."""
    again = pack_documents(documents, budget=64, num_streams=8)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, packed.collect())
    )
    assert packed.count() == documents.count()
    assert packed.select("doc_id").distinct().count() == documents.count()


def test_summary_fill_and_chunks(packed):
    summ = pack_summary(packed, budget=64)
    totals = {
        r["stream"]: r["n_tokens"]
        for r in packed.groupBy("stream")
        .agg(F.sum("n_tokens").alias("n_tokens"))
        .collect()
    }
    for r in summ.collect():
        assert r["n_chunks"] == math.ceil(totals[r["stream"]] / 64)
        assert 0.0 < r["fill"] <= 1.0
        assert r["fill"] == pytest.approx(
            totals[r["stream"]] / (r["n_chunks"] * 64)
        )


def test_no_single_partition_window(spark, documents):
    """The scale property the stream sharding exists for: the cumulative
    sum runs per stream slice — the plan must contain a hash exchange on
    stream and NO single-partition exchange (a global-order window would
    serialize the whole corpus through one task)."""
    plan = (
        pack_documents(documents, budget=64, num_streams=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "hashpartitioning(stream" in plan


def test_parameter_validation(documents):
    with pytest.raises(ValueError, match="budget"):
        pack_documents(documents, budget=0)
    with pytest.raises(ValueError, match="num_streams"):
        pack_documents(documents, budget=64, num_streams=0)
