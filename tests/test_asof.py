"""As-of join semantics on a hand-computable fixture: strict vs
allow_exact boundary behavior, missing-match NULLs, multi-column payload
atomicity."""

from __future__ import annotations

from meteomatics_e2e_data_pipeline_spark.operators.asof import asof_join


def test_asof_strict_and_exact(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 15)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, "a", 100), (1, 18, "b", 200), (2, 99, "c", 300)],
        "k int, ts int, v string, w int")

    strict = {(r["k"], r["ts"]): (r["asof_v"], r["asof_w"]) for r in
              asof_join(left, right, ["k"], "ts", "ts", ["v", "w"]).collect()}
    # ts=5: the equal-ts quote is NOT visible under strict (>)
    assert strict[(1, 5)] == (None, None)
    assert strict[(1, 10)] == ("a", 100)
    assert strict[(1, 20)] == ("b", 200)
    assert strict[(2, 15)] == (None, None)   # right row is in the future

    exact = {(r["k"], r["ts"]): (r["asof_v"], r["asof_w"]) for r in
             asof_join(left, right, ["k"], "ts", "ts", ["v", "w"],
                       allow_exact=True).collect()}
    assert exact[(1, 5)] == ("a", 100)       # >= admits the equal-ts row
    assert exact[(1, 10)] == ("a", 100)


def test_asof_payload_is_atomic(spark):
    # two right rows at the SAME ts: whichever wins, v and w must come
    # from the same row (struct payload), never mixed
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, "a", 100), (1, 5, "z", 999)], "k int, ts int, v string, w int")
    r = asof_join(left, right, ["k"], "ts", "ts", ["v", "w"]).first()
    assert (r["asof_v"], r["asof_w"]) in {("a", 100), ("z", 999)}
