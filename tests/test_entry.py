"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, and a sample of oracle queries hash-match DuckDB at sf0.001
(the full sweep runs via tools/check_correctness.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE

from tools.check_correctness import TABLES, canon_rows

SAMPLE = ["cdc_final_state", "q1_pricing_summary", "dedup_exact", "similarity_topk"]


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert "user_id" in df.columns


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    # every query except explicitly-weak ones has an oracle
    assert len(os_) >= len(qs) - 1


@pytest.mark.parametrize("name", SAMPLE)
def test_sample_queries_match_oracle(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    sdf = entry.queries()[name](spark, SF_SMOKE).toPandas()
    odf = con.execute(entry.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canon_rows(sdf) == canon_rows(odf)
