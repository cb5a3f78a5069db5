"""Pending (round-6 queue) contract rows: full Spark-vs-DuckDB value-hash
proof at sf0.001, the same comparison the driver gate applies — run here so
the rows are already proven when round 6 promotes them into the registry.

tools/check_contract.py --pending runs the same rows at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from timeseriestokenizer_spark import contract_pending
from timeseriestokenizer_spark.oracle.compare import rows_sorted, value_hash

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(contract_pending.PENDING_QUERIES))
def test_pending_row_matches_oracle(spark, duck, name):
    sdf = contract_pending.PENDING_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(contract_pending.pending_oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: schema {scols} vs {dcols}"
    if value_hash(srows, scols) != value_hash(drows, dcols):
        sset, dset = rows_sorted(srows, scols), rows_sorted(drows, dcols)
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        pytest.fail(f"{name}: value hash mismatch, first diffs: {diffs}")
    assert len(srows) > 0, f"{name}: empty result proves nothing"
