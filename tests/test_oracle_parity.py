"""Every queries() entry with an oracle must match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_util import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare(df, ORACLES[name], sf_oracle)
    assert ok, f"{name}: {msg}"
