"""Oracle dtype gate (round-5, judge item #2).

The driver hashes query output *after* a pandas round-trip, so an
oracle whose column types render differently from Spark's breaks the
value-hash even when every cell is numerically identical.  The r04
reds (t21, s11) were exactly this: DuckDB types ``SUM(integer)`` as
HUGEINT, pandas has no int128 so it renders float64 ("-1234.0"),
while Spark returns int64 ("-1234").

This test plans every ``oracle_sql()`` entry in DuckDB (lazy — no
execution, just the inferred output types) and fails on any
HUGEINT/UHUGEINT column, so builder-green always implies driver-green
for this drift class.  Full per-column family comparison against the
live Spark schema runs in tools/oracle_check.py.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _oracle_items():
    return sorted(entrymod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_emits_no_hugeint(duck, name, sql):
    try:
        rel = duck.sql(sql)
        types = [str(t).lower() for t in rel.types]
        cols = list(rel.columns)
    except duckdb.Error as e:
        # Oracles that reference Spark-side temp state can't plan
        # standalone here; the live comparison covers them.
        pytest.skip(f"oracle not standalone-plannable: {e}")
    bad = [
        (c, t) for c, t in zip(cols, types) if t in ("hugeint", "uhugeint")
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} are HUGEINT — pandas renders them "
        f"float64 and the driver's typed value-hash diverges from Spark's "
        f"int64. CAST(... AS BIGINT) in the oracle (and, if shared text, "
        f"the Spark SQL too)."
    )
