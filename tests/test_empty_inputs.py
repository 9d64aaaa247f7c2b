"""Degenerate-input robustness gate: every batch query must EXECUTE
(not necessarily return rows) against empty tables with the production
schemas. Guards the classic failure classes: sequence(0, -1) on empty
docs, division by zero on empty aggregates, min/max of nothing feeding
window bounds, argmin over an empty codebook.
"""

import os

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        src = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_every_batch_query_survives_empty_tables(spark, empty_sf):
    failures = {}
    for name, fn in entry.queries().items():
        if name.startswith("st") or name.startswith("m0"):
            continue  # streaming stages the source dir itself; media is synthetic
        try:
            n = fn(spark, empty_sf).count()
            assert n >= 0
        except Exception as e:
            failures[name] = str(e).split("\n")[0][:140]
    assert failures == {}
