"""PII scrubbing (operators/pii.py): handcrafted PII-laden docs pinned
cross-engine — the contract row only exercises the identity path (the
synthetic corpus carries no PII), so the POSITIVE behavior of every
pattern is verified here against DuckDB running the exact oracle SQL on
the same rows."""

import duckdb
import pytest

from kowari_spark.operators.pii import pii_scrub

DOCS = [
    (0, "contact bob@example.com or alice.smith+spam@sub.domain.org today"),
    (1, "see https://example.com/a?b=c and http://x.y/z for details"),
    (2, "call +1 (650) 555-0100 or 650-555-0199 now"),
    (3, "mixed: http://u:pw@host.com/p bob@x.co 212 555 0100 end"),
    (4, "clean text with no personal identifiers at all"),
    (5, "edge@case.museum then https://e.f/g#h then 0123456789"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in pii_scrub(df).collect()}


def test_counts_and_placeholders(scrubbed):
    r = scrubbed[0]
    assert (r["n_email"], r["n_url"], r["n_phone"]) == (2, 0, 0)
    assert r["scrubbed"] == "contact <EMAIL> or <EMAIL> today"
    r = scrubbed[1]
    assert (r["n_url"], r["n_email"]) == (2, 0)
    assert r["scrubbed"] == "see <URL> and <URL> for details"
    r = scrubbed[2]
    assert r["n_phone"] == 2
    assert r["scrubbed"] == "call <PHONE> or <PHONE> now"


def test_url_swallows_userinfo_before_email_pass(scrubbed):
    """URLs scrub FIRST: an embedded userinfo '@' must not leave a
    half-redacted URL behind."""
    r = scrubbed[3]
    assert r["n_url"] == 1 and r["n_email"] == 1 and r["n_phone"] == 1
    assert r["scrubbed"] == "mixed: <URL> <EMAIL> <PHONE> end"


def test_clean_text_untouched(scrubbed):
    r = scrubbed[4]
    assert r["scrubbed"] == DOCS[4][1]
    assert (r["n_url"], r["n_email"], r["n_phone"]) == (0, 0, 0)


def test_cross_engine_parity_on_pii_rows(spark):
    """Spark (Java regex) and DuckDB (RE2) must agree on every
    handcrafted row — counts AND the scrubbed-text fingerprint — via
    the exact oracle SQL the contract uses."""
    import pandas as pd

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = (
        pii_scrub(df)
        .select(
            "doc_id", F.md5("scrubbed").alias("scrub_fp"),
            "n_url", "n_email", "n_phone",
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = (
        con.execute(entry._oracle_doc_pii_scrub())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want
    )
