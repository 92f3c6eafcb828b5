"""operators/hierarchy.py: pointer-doubling ancestor rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.hierarchy import (
    ancestor_rollup,
)


def _nodes(spark, rows):
    from decimal import Decimal
    rows = [(i, p, Decimal(str(w))) for i, p, w in rows]
    return spark.createDataFrame(
        rows, "id bigint, parent bigint, w decimal(18,2)")


def test_forest_depths_roots_and_path_sums(spark):
    # two trees:  0 <- 1 <- 2 <- 3 (a chain)  and  10 <- 11, 10 <- 12
    rows = [(0, 0, 1.00), (1, 0, 2.00), (2, 1, 4.00), (3, 2, 8.00),
            (10, 10, 100.00), (11, 10, 20.00), (12, 10, 30.00)]
    out = {r["id"]: (r["root_key"], r["depth"], float(r["path_sum"]))
           for r in ancestor_rollup(_nodes(spark, rows)).collect()}
    assert out == {
        0: (0, 0, 1.00), 1: (0, 1, 3.00), 2: (0, 2, 7.00),
        3: (0, 3, 15.00),
        10: (10, 0, 100.00), 11: (10, 1, 120.00), 12: (10, 1, 130.00),
    }


def test_deep_chain_converges_in_log_rounds(spark):
    # depth-40 chain: doubling must converge well under 40 iterations —
    # pass a tight max_iters that only a log-round walk satisfies.
    rows = [(0, 0, 1.00)] + [(i, i - 1, 1.00) for i in range(1, 41)]
    out = ancestor_rollup(_nodes(spark, rows), max_iters=8)
    got = {r["id"]: (r["depth"], float(r["path_sum"]))
           for r in out.collect()}
    assert got[40] == (40, 41.00)
    assert got[1] == (1, 2.00)


def test_cycle_raises(spark):
    rows = [(0, 0, 1.00), (1, 2, 1.00), (2, 1, 1.00)]
    with pytest.raises(ValueError, match="converge"):
        ancestor_rollup(_nodes(spark, rows), max_iters=6)


def test_orphan_parent_raises(spark):
    # node 2 points at parent 99 which is absent from the input — a
    # malformed forest, like a cycle; must fail loudly instead of
    # silently dropping node 2 (and draining its subtree, node 3).
    rows = [(0, 0, 1.00), (1, 0, 2.00), (2, 99, 4.00), (3, 2, 8.00)]
    with pytest.raises(ValueError, match="orphan"):
        ancestor_rollup(_nodes(spark, rows))


def test_null_weight_parent_is_not_an_orphan(spark):
    # A parent that EXISTS but carries a NULL weight is a legitimate
    # forest (r8 advisor finding: the orphan guard must key on row
    # presence, not on the weight column). The walk must complete, and
    # the NULL weight propagates into descendants' path sums with the
    # usual SQL null-sum semantics.
    rows = [(0, 0, None), (1, 0, 2.00), (2, 1, 4.00)]
    from decimal import Decimal
    rows = [(i, p, None if w is None else Decimal(str(w)))
            for i, p, w in rows]
    df = spark.createDataFrame(
        rows, "id bigint, parent bigint, w decimal(18,2)")
    out = {r["id"]: (r["root_key"], r["depth"],
                     None if r["path_sum"] is None else float(r["path_sum"]))
           for r in ancestor_rollup(df).collect()}
    assert out == {0: (0, 0, None), 1: (0, 1, None), 2: (0, 2, None)}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data(), n=st.integers(min_value=1, max_value=40))
def test_ancestor_rollup_matches_python_walk(spark, data, n):
    """Property: on ANY random forest (parent drawn from earlier ids —
    acyclic by construction, including degenerate deep chains and
    star-everything-under-root shapes), pointer doubling must agree
    with a sequential Python walk on root, depth, and exact path sum."""
    from decimal import Decimal

    parents = [data.draw(st.integers(min_value=0, max_value=i),
                         label=f"parent_{i}")
               for i in range(n)]
    parents[0] = 0
    weights = [data.draw(st.integers(min_value=0, max_value=999),
                         label=f"w_{i}")
               for i in range(n)]
    rows = [(i, parents[i] if parents[i] != i else i,
             Decimal(weights[i]) / 100) for i in range(n)]
    got = {r["id"]: (r["root_key"], r["depth"], r["path_sum"])
           for r in ancestor_rollup(_nodes(spark, rows)).collect()}

    def walk(i):
        depth, s = 0, Decimal(weights[i]) / 100
        while parents[i] != i:
            i = parents[i]
            depth += 1
            s += Decimal(weights[i]) / 100
        return i, depth, s

    want = {i: walk(i) for i in range(n)}
    assert got == want
