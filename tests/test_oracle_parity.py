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


def test_parity_mirror_catches_cent_level_drift(spark, sf_oracle):
    """The local gate must be as strict as the driver's value hash: a
    deliberately injected cent-level error has to fail, and a HUGEINT
    oracle type has to be flagged before it ever reaches the driver."""
    from tests.oracle_util import compare

    df = spark.createDataFrame([("a", 12.34)], "k string, v double")
    ok, _ = compare(df, "SELECT 'a' AS k, 12.34::DOUBLE AS v", sf_oracle)
    assert ok
    ok, msg = compare(df, "SELECT 'a' AS k, 12.35::DOUBLE AS v", sf_oracle)
    assert not ok and "values differ" in msg
    # driver failure mode from round 2: HUGEINT coerces to float64 in the
    # driver's pandas fetch and breaks the hash even when values match
    big = spark.createDataFrame([(1,)], "v long")
    ok, msg = compare(big, "SELECT 1::HUGEINT AS v", sf_oracle)
    assert not ok and "HUGEINT" in msg


def test_gate_slots_are_all_oracle_backed_and_unique():
    """Structural guard on the 50-slot driver gate (r9 verdict #2's
    wasted-slot flag, made unrepeatable): every one of the first 50
    queries() entries must have an oracle — a rows-only query in the
    gate can only ever return `no_oracle` and burns an attestation
    slot — _VERIFY_FIRST must hold exactly 50 unique existing names,
    and every declared query must be callable."""
    import __spark_entry__ as e

    names = list(QUERIES)
    head = names[:50]
    assert len(e._VERIFY_FIRST) == 50
    assert len(set(e._VERIFY_FIRST)) == 50
    assert all(k in QUERIES for k in e._VERIFY_FIRST)
    missing = [k for k in head if k not in ORACLES]
    assert not missing, f"rows-only queries occupy gate slots: {missing}"
