"""Driver-contract smoke: entry() runs; queries ↔ oracles agree.

The full sweep lives in tools/check_oracles.py (run at sf0.01, all
queries); here a representative subset at sf0.001 keeps CI fast.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "a1_pricing_summary",
    "o3_topk_window",
    "w8_lag_pairs",
    "g_morton_cells",
    "g_pip_polygon",
    "g_knn_assign",
    "g_density_grid",
    "t_near_dup_jaccard",
    "e_ann_topk_ip",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"image_id", "x", "y", "cell", "tile", "sid", "name"}


@pytest.mark.parametrize("name", SUBSET)
def test_query_vs_oracle(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    want = duck.sql(oracles[name]).df()
    problems = compare(name, got, want)
    assert not problems, problems


def test_every_query_has_matching_oracle_columns(spark, duck):
    """Every oracle runs and produces the same column set as its query."""
    qs = entrymod.queries()
    for name, sql in entrymod.oracle_sql().items():
        assert name in qs, f"oracle {name} has no query"
        want_cols = set(duck.sql(sql).df().columns)
        got_cols = set(qs[name](spark, SF_DIR).columns)
        assert got_cols == want_cols, (name, got_cols, want_cols)
