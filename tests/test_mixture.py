"""Mixture-targeted sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.sampling import (
    hash_uniform,
    mixture_rates,
    mixture_sample,
)


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, "A") for i in range(100)]
    rows += [(100 + i, "B") for i in range(50)]
    rows += [(200 + i, "C") for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_rates_hit_target_mixture(strata_df):
    # lambda = min(100/0.5, 50/0.5) = 100 -> A keeps 50 (rate .5), B all
    rates = {
        r["stratum"]: r
        for r in mixture_rates(strata_df, "lang", {"A": 0.5, "B": 0.5}).collect()
    }
    assert set(rates) == {"A", "B"}
    assert rates["A"]["n_rows"] == 100 and rates["A"]["rate"] == 0.5
    assert rates["B"]["rate"] == 1.0


def test_sample_is_deterministic_and_respects_rates(strata_df):
    out = mixture_sample(strata_df, "lang", {"A": 0.5, "B": 0.5}, seed=7)
    assert out.columns == strata_df.columns
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    # B has rate 1.0 and u < 1.0 always: every row kept; C dropped
    assert counts["B"] == 50 and "C" not in counts
    # A's kept set is exactly the rows whose stable hash-uniform < 0.5
    expected_a = strata_df.filter(
        (F.col("lang") == "A") & (hash_uniform("doc_id", 7) < 0.5)
    ).count()
    assert counts["A"] == expected_a
    # rerun -> identical rows (pure function of identity)
    again = mixture_sample(strata_df, "lang", {"A": 0.5, "B": 0.5}, seed=7)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_target_stratum_missing_from_data_is_ignored(strata_df):
    rates = {
        r["stratum"]: r["rate"]
        for r in mixture_rates(
            strata_df, "lang", {"A": 0.4, "B": 0.4, "Z": 0.2}
        ).collect()
    }
    # lambda = min(100/.4, 50/.4) = 125 -> A rate .5, B rate 1
    assert set(rates) == {"A", "B"}
    assert rates["A"] == 0.5 and rates["B"] == 1.0


def test_scarcest_stratum_used_in_full(strata_df):
    # C is scarcest vs its demand: lambda = min(100/.2, 50/.2, 30/.6)=50
    rates = {
        r["stratum"]: r["rate"]
        for r in mixture_rates(
            strata_df, "lang", {"A": 0.2, "B": 0.2, "C": 0.6}
        ).collect()
    }
    assert rates["C"] == 1.0
    assert rates["A"] == 0.1 and rates["B"] == 0.2


def test_rates_join_is_broadcast(strata_df):
    plan = (
        mixture_sample(strata_df, "lang", {"A": 0.5, "B": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bad_weights_rejected(strata_df):
    with pytest.raises(ValueError):
        mixture_rates(strata_df, "lang", {})
    with pytest.raises(ValueError):
        mixture_rates(strata_df, "lang", {"A": 0.0})
